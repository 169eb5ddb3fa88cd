"""LLM-data-pipeline operators (dedup, similarity, text analysis, multimodal).

These are first-class extensions beyond the reference's surface, mandated by
the north star (SURVEY §0, §7.2 M7).
"""

from . import bloom, bpe, classify, cluster, cms, curation, dedup, graph, layout, logreg, mix, multimodal, pq, relevance, rproj, similarity, sketch, snapshot, spans, text, timeseries, winnow  # noqa: F401
