#!/usr/bin/env python
"""Per-module markdown API reference generator.

Re-design of the reference's ``generate_api_docs.py``: walks every public
subpackage, emits one markdown page per module with class/function signatures
and docstrings, straight from the live package.

    python docs/generate_api_docs.py [--out docs/generated/api]
"""

from __future__ import annotations

import argparse
import inspect
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SUBPACKAGES = (
    "core", "integrators", "interpolants", "couplings", "samplers",
    "losses", "models", "datasets", "ops", "parallel", "utils",
)


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _doc(obj, limit=None) -> str:
    doc = inspect.getdoc(obj) or ""
    if limit:
        doc = doc.split("\n\n")[0]
    return doc


def render_module(modname: str) -> str:
    import importlib

    mod = importlib.import_module(modname)
    md = [f"# `{modname}`", "", _doc(mod), ""]
    names = getattr(mod, "__all__", None) or sorted(
        n for n in vars(mod) if not n.startswith("_")
    )
    for name in names:
        obj = getattr(mod, name, None)
        if obj is None:
            continue
        if inspect.isclass(obj):
            md += [f"## class `{name}{_sig(obj)}`", "", _doc(obj), ""]
            for mname, meth in sorted(vars(obj).items()):
                if mname.startswith("_") or not callable(meth):
                    continue
                mdoc = _doc(meth, limit=True)
                if mdoc:
                    md += [f"### `{name}.{mname}{_sig(meth)}`", "", mdoc, ""]
        elif inspect.isfunction(obj):
            md += [f"## `{name}{_sig(obj)}`", "", _doc(obj), ""]
        elif isinstance(obj, dict):
            md += [f"## `{name}`", "", f"Registry with {len(obj)} entries: "
                   + ", ".join(f"`{k}`" for k in sorted(map(str, obj))), ""]
    return "\n".join(md)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--out", default=os.path.join(os.path.dirname(__file__), "generated", "api")
    )
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    index = ["# API reference", ""]
    for sub in SUBPACKAGES:
        modname = f"torchebm_tpu.{sub}"
        page = render_module(modname)
        path = os.path.join(args.out, f"{sub}.md")
        with open(path, "w") as f:
            f.write(page)
        index.append(f"- [`{modname}`]({sub}.md)")
        print(f"wrote {path}")
    with open(os.path.join(args.out, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")


if __name__ == "__main__":
    main()
