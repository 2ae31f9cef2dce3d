"""Generate example gallery pages from ``examples/**/meta.yaml``.

Re-design of the reference hook (``docs/hooks/gen_examples.py``): every
example folder with a ``meta.yaml`` becomes a gallery entry ordered by its
``order`` field, with the entrypoint source embedded.
"""

from __future__ import annotations

import os
import sys

import yaml

REPO = os.path.join(os.path.dirname(__file__), "..", "..")
EXAMPLES = os.path.join(REPO, "examples")
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "generated")


def discover():
    cases = []
    for root, _, files in os.walk(EXAMPLES):
        if "meta.yaml" in files:
            with open(os.path.join(root, "meta.yaml")) as f:
                meta = yaml.safe_load(f)
            cases.append((os.path.relpath(root, EXAMPLES), root, meta))
    return sorted(cases, key=lambda c: int(c[2].get("order", 999)))


def gen_gallery(link_prefix: str = "examples/") -> str:
    """Gallery table; ``link_prefix`` locates the per-example pages relative
    to the page hosting the table (in-page injection uses
    ``generated/examples/``)."""
    md = ["# Examples", "", "| example | difficulty | tags | summary |", "|---|---|---|---|"]
    for name, root, meta in discover():
        tags = ", ".join(meta.get("tags", []))
        md.append(
            f"| [{meta['title']}]({link_prefix}{name.replace(os.sep, '_')}.md) "
            f"| {meta.get('difficulty', '-')} | {tags} | {meta['summary']} |"
        )
    md.append("")
    return "\n".join(md)


def gen_pages():
    pages = {}
    for name, root, meta in discover():
        src = open(os.path.join(root, meta["entrypoint"])).read()
        pages[name.replace(os.sep, "_") + ".md"] = "\n".join(
            [
                f"# {meta['title']}",
                "",
                meta["summary"],
                "",
                f"*Difficulty: {meta.get('difficulty', '-')}. "
                f"Run with* `python examples/{name}/{meta['entrypoint']}`.",
                "",
                "```python",
                src,
                "```",
                "",
            ]
        )
    return pages


def main() -> None:
    os.makedirs(os.path.join(OUT_DIR, "examples"), exist_ok=True)
    gallery = os.path.join(OUT_DIR, "examples.md")
    with open(gallery, "w") as f:
        f.write(gen_gallery())
    print(f"wrote {gallery}")
    for fname, content in gen_pages().items():
        path = os.path.join(OUT_DIR, "examples", fname)
        with open(path, "w") as f:
            f.write(content)
    print(f"wrote {len(gen_pages())} example pages")


def on_files(files, config):  # pragma: no cover
    main()
    return files


if __name__ == "__main__":
    main()
