"""User-extension surface — the reference's plugin + config-driven-operator
system re-expressed for the Ray engine.

Reference (SURVEY.md §2.14):
- drop-in plugin packages with ``__enabled__`` / ``__main_function__``
  metadata, auto-discovered and grafted onto the CLI
  (/root/reference/plugins/README.md:1-110; loader howard/main.py:63-114;
  discovery howard/functions/plugins.py:5-124);
- JSON-config calculations compiled to SQL passes
  (config/calculations_config.json; howard/objects/variants.py:8237-8510).

Here:
- a plugin is any module in ``<repo>/plugins/`` defining ``__enabled__ =
  True`` and a ``register(registry)`` function that adds named operators
  (callables ``sf_dir -> table``) and optionally oracle SQL;
- a *calculation config* is a JSON list of specs compiled into ONE
  vectorized ``map_batches`` pass (the reference compiles each into an
  UPDATE; we compile to pyarrow.compute expressions).

Calculation spec (mirrors the reference's calculations_config entries):
    {"name": "revenue", "op": "mul", "args": ["l_extendedprice", ...]}
    ops: add | sub | mul | div | concat | length | const | col
    args: column names, nested specs, or {"const": value}
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc


def _eval_spec(spec, batch: pa.Table):
    if isinstance(spec, str):
        return batch[spec]
    if isinstance(spec, (int, float)):
        return pa.scalar(spec)
    if "const" in spec:
        return pa.scalar(spec["const"])
    op = spec["op"]
    args = [_eval_spec(a, batch) for a in spec.get("args", [])]
    if op == "add":
        return pc.add(*args)
    if op == "sub":
        return pc.subtract(*args)
    if op == "mul":
        return pc.multiply(*args)
    if op == "div":
        return pc.divide(*args)
    if op == "concat":
        return pc.binary_join_element_wise(*[pc.cast(a, pa.string()) for a in args], "")
    if op == "length":
        return pc.utf8_length(args[0])
    if op == "round":
        return pc.round(args[0], spec.get("ndigits", 2),
                        round_mode="half_towards_infinity")
    raise ValueError(f"unknown calculation op {op}")


def compile_calculations(specs: list[dict]):
    """Compile a calculations config into one vectorized batch function —
    the analog of the reference's calculation_process_sql
    (variants.py:8365-8510), without per-field UPDATE passes."""
    def apply(batch: pa.Table) -> pa.Table:
        out = dict(zip(batch.column_names, batch.columns))
        for spec in specs:
            out[spec["name"]] = _eval_spec(spec, batch)
        return pa.table(out)
    return apply


class Registry:
    """What plugins register into (queries + oracle SQL)."""

    def __init__(self):
        self.queries: dict = {}
        self.oracle_sql: dict[str, str] = {}

    def add(self, name: str, fn, sql: str | None = None):
        self.queries[name] = fn
        if sql:
            self.oracle_sql[name] = sql


def discover_plugins(plugins_dir: str | None = None) -> Registry:
    """Load every enabled plugin module from ``plugins/`` (reference
    discovery shape: iterate dir, check __enabled__, call entry point)."""
    reg = Registry()
    root = plugins_dir or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plugins")
    if not os.path.isdir(root):
        return reg
    for name in sorted(os.listdir(root)):
        path = os.path.join(root, name)
        mod_file = (os.path.join(path, "__init__.py")
                    if os.path.isdir(path) else path)
        if not mod_file.endswith(".py") or not os.path.exists(mod_file):
            continue
        mod_name = f"howard_ray_plugin_{os.path.splitext(name)[0]}"
        spec = importlib.util.spec_from_file_location(mod_name, mod_file)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[mod_name] = mod
        spec.loader.exec_module(mod)
        if getattr(mod, "__enabled__", False) and hasattr(mod, "register"):
            mod.register(reg)
    return reg
