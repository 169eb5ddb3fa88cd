"""dbt export — rendered chain → model.sql (+ schema.yml).

Reference: chain.to_dbt (transforms.py:377-419) writing model/schema/project
files via utils/dbt.py:19-158. Output here is Spark-SQL text, compatible with
dbt-spark.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING, Optional

import yaml

if TYPE_CHECKING:
    from .dataset import SQLChain


def save_model(
    chain: "SQLChain",
    output_directory: str = ".",
    file_name: Optional[str] = None,
    config_args: Optional[dict] = None,
    include_schema: bool = False,
) -> str:
    os.makedirs(output_directory, exist_ok=True)
    name = file_name or f"{chain.fqtn.split('/')[-1].split('.')[0]}_model.sql"
    if not name.endswith(".sql"):
        name += ".sql"
    model_path = os.path.join(output_directory, name)
    sql_text = chain.sql()
    with open(model_path, "w") as f:
        if config_args:
            f.write("{{ config(" + ", ".join(f"{k}={v!r}" for k, v in config_args.items()) + ") }}\n\n")
        f.write(sql_text)
        f.write("\n")
    if include_schema:
        schema_path = os.path.join(output_directory, "schema.yml")
        model_entry = {
            "name": name[: -len(".sql")],
            "columns": [{"name": c, "description": t} for c, t in chain.get_schema()],
        }
        doc = {"version": 2, "models": [model_entry]}
        if os.path.exists(schema_path):
            # merge with existing models list (reference utils/dbt.py:127-158)
            with open(schema_path) as f:
                existing = yaml.safe_load(f) or {"version": 2, "models": []}
            models = [m for m in existing.get("models", []) if m.get("name") != model_entry["name"]]
            models.append(model_entry)
            doc = {"version": existing.get("version", 2), "models": models}
        with open(schema_path, "w") as f:
            yaml.safe_dump(doc, f, sort_keys=False)
    return model_path
