# scripts/gen_api_docs.py
"""Regenerate docs/api.md: a public-API summary built by introspection.

For every listed module, emits the module docstring's first paragraph and
one bullet per ``__all__`` entry with its signature (when cheap to build)
and first docstring line. Run after adding/renaming public API:

    python scripts/gen_api_docs.py
"""

from __future__ import annotations

import importlib
import inspect
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

MODULES = [
    "encodermap_tpu",
    "encodermap_tpu.parameters",
    "encodermap_tpu.losses",
    "encodermap_tpu.loss_classes",
    "encodermap_tpu.nn",
    "encodermap_tpu.ops.distances",
    "encodermap_tpu.ops.backmap",
    "encodermap_tpu.ops.backmap_sidechains",
    "encodermap_tpu.ops.geometry",
    "encodermap_tpu.ops.kabsch",
    "encodermap_tpu.ops.dssp",
    "encodermap_tpu.ops.pallas_sigmoid",
    "encodermap_tpu.ops.pallas_train",
    "encodermap_tpu.ops.adc_adjoint",
    "encodermap_tpu.models.sequential",
    "encodermap_tpu.models.adc",
    "encodermap_tpu.train.core",
    "encodermap_tpu.train.autoencoder",
    "encodermap_tpu.train.adc_autoencoder",
    "encodermap_tpu.train.callbacks",
    "encodermap_tpu.train.metrics",
    "encodermap_tpu.data.trajectory",
    "encodermap_tpu.data.topology",
    "encodermap_tpu.data.custom_topology",
    "encodermap_tpu.data.pdb",
    "encodermap_tpu.data.xtc",
    "encodermap_tpu.data.formats",
    "encodermap_tpu.data.cvstore",
    "encodermap_tpu.loading.features",
    "encodermap_tpu.loading.featurizer",
    "encodermap_tpu.loading.alignment",
    "encodermap_tpu.parallel.mesh",
    "encodermap_tpu.parallel.distributed",
    "encodermap_tpu.parallel.sharded_featurize",
    "encodermap_tpu.misc.saving",
    "encodermap_tpu.misc.summaries",
    "encodermap_tpu.misc.clustering",
    "encodermap_tpu.misc.backmapping_offline",
    "encodermap_tpu.misc.profiling",
    "encodermap_tpu.misc.function_def",
    "encodermap_tpu.misc.misc",
    "encodermap_tpu.plot.plotting",
    "encodermap_tpu.plot.interactive",
    "encodermap_tpu.plot.dashboard",
    "encodermap_tpu.kondata",
    "encodermap_tpu.moldata",
]


def first_line(doc: str | None) -> str:
    if not doc:
        return ""
    return doc.strip().splitlines()[0].strip()


def first_paragraph(doc: str | None) -> str:
    if not doc:
        return ""
    out = []
    for line in doc.strip().splitlines():
        if not line.strip():
            break
        out.append(line.rstrip())
    return "\n".join(out)


def entry(mod, name: str) -> str:
    try:
        obj = getattr(mod, name)
    except AttributeError:
        return f"- **`{name}`** — MISSING (listed in __all__ but undefined)"
    label = f"`{name}(...)`" if callable(obj) else f"`{name}`"
    if callable(obj):
        try:
            sig = str(inspect.signature(obj))
            if len(sig) <= 60:
                label = f"`{name}{sig}`"
        except (ValueError, TypeError):
            pass
    return f"- **{label}** — {first_line(inspect.getdoc(obj))}".rstrip(" —")


def main() -> None:
    lines = ["# API reference (auto-generated summary)", ""]
    for modname in MODULES:
        try:
            mod = importlib.import_module(modname)
        except Exception as e:  # import-gated optional deps
            lines += [f"## `{modname}`", "", f"(not importable here: {e})", ""]
            continue
        lines += [f"## `{modname}`", ""]
        para = first_paragraph(inspect.getdoc(mod))
        if para:
            lines += [para, ""]
        names = getattr(mod, "__all__", None)
        if names:
            lines += [entry(mod, n) for n in names]
            lines += [""]
    (REPO / "docs" / "api.md").write_text("\n".join(lines))
    print(f"wrote docs/api.md ({len(lines)} lines, {len(MODULES)} modules)")


if __name__ == "__main__":
    main()
