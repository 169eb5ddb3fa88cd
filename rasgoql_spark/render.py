"""Chain → SQL text assembly (parity artifact — never the execution path).

Reference: assemble_cte_chain / assemble_view_chain
(rasgoql/rasgoql/primitives/rendering.py:29-96). Transform N's source table is
transform N-1's CTE alias; a single-step chain skips the WITH wrapper
(rendering.py:38-49). Dialect emitted here is Spark SQL.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from . import registry
from .errors import TransformRenderingException

if TYPE_CHECKING:
    from .dataset import SQLChain, Step


def render_step(step: "Step", source_table: str) -> str:
    tdef = registry.get_transform(step.name)
    if tdef.render is None:
        raise TransformRenderingException(
            f"transform {step.name!r} has no SQL renderer (DataFrame-only op); "
            "the chain still executes — only .sql()/to_dbt text is unavailable"
        )
    import inspect

    kwargs = dict(step.kwargs)
    # table-valued args render as their source name / inline subquery; a list
    # value holds per-spec names for multi_join — substitute into the specs
    for k, rendered in step.table_args.items():
        if isinstance(rendered, list):
            kwargs[k] = [
                {**spec, "join_table": name}
                for spec, name in zip(kwargs[k], rendered)
            ]
        else:
            kwargs[k] = rendered
    params = inspect.signature(tdef.render).parameters
    if "_input_columns" in params:
        kwargs["_input_columns"] = step.input_columns
    if "_table_columns" in params:
        kwargs["_table_columns"] = step.table_columns
    return tdef.render(source_table, **kwargs)


def assemble_cte_chain(chain: "SQLChain") -> str:
    steps = chain.steps
    if not steps:
        return f"SELECT * FROM {chain.fqtn}"
    if len(steps) == 1:
        return render_step(steps[0], chain.fqtn)
    ctes = []
    source = chain.fqtn
    for step in steps[:-1]:
        ctes.append(f"{step.output_alias} AS (\n{render_step(step, source)}\n)")
        source = step.output_alias
    final = render_step(steps[-1], source)
    return "WITH " + ",\n".join(ctes) + "\n" + final


def assemble_view_chain(chain: "SQLChain") -> str:
    """One CREATE OR REPLACE VIEW per step (reference rendering.py:74-96)."""
    out = []
    source = chain.fqtn
    for step in chain.steps:
        out.append(
            f"CREATE OR REPLACE VIEW {step.output_alias} AS\n"
            f"{render_step(step, source)};"
        )
        source = step.output_alias
    return "\n\n".join(out)
