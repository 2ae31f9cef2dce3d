r"""Build-time introspection: component diagrams, registry tables, class trees.

Re-design of the reference's mkdocs hook (``docs/hooks/gen_diagrams.py``):
everything is generated from the *installed package* — registries, ``__all__``
exports, class hierarchies — so docs never drift from code. Without mkdocs in
the environment, running this module writes standalone markdown into
``docs/generated/`` (the hook entry points remain importable for an mkdocs
build) AND rewrites marker blocks inside the committed pages under ``docs/``
— the reference's in-page injection pattern (its ``MARKER`` regexes,
reference ``docs/hooks/gen_diagrams.py:1-18``):

    <!-- GEN:components -->
    ...replaced with generated content on every run...
    <!-- /GEN:components -->

Marker names: ``components``, ``composition``, ``class_trees``, ``gallery``
(the last delegates to ``gen_examples.py``).

Standalone outputs (``docs/generated/``):

- ``components.md`` — per-registry tables (integrators, interpolants,
  couplings, datasets) + exported-symbol inventory per subpackage
- ``composition.md`` — the six-axis composition map as a mermaid diagram
- ``class_trees.md`` — base-class hierarchies rendered as indented trees
"""

from __future__ import annotations

import inspect
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # sibling hooks

DOCS_DIR = os.path.join(os.path.dirname(__file__), "..")
OUT_DIR = os.path.join(DOCS_DIR, "generated")

#: in-page injection block: <!-- GEN:name --> ... <!-- /GEN:name -->
MARKER = re.compile(r"(<!-- GEN:([a-z_]+) -->)(.*?)(<!-- /GEN:\2 -->)", re.S)


def _first_line(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    line = doc.split("\n", 1)[0].strip()
    return line.replace("|", "\\|")


def gen_components() -> str:
    import torchebm_tpu
    from torchebm_tpu.couplings import COUPLING_REGISTRY
    from torchebm_tpu.datasets import DATASET_REGISTRY
    from torchebm_tpu.integrators import INTEGRATOR_REGISTRY
    from torchebm_tpu.interpolants import INTERPOLANT_REGISTRY

    md = ["# Component inventory", ""]
    for title, registry in (
        ("Integrators", INTEGRATOR_REGISTRY),
        ("Interpolants", INTERPOLANT_REGISTRY),
        ("Couplings", COUPLING_REGISTRY),
        ("Datasets", DATASET_REGISTRY),
    ):
        md += [f"## {title} (registry)", "", "| name | class | summary |", "|---|---|---|"]
        for name, cls in sorted(registry.items()):
            md.append(f"| `{name}` | `{cls.__name__}` | {_first_line(cls)} |")
        md.append("")

    md += ["## Exported symbols per subpackage", ""]
    for sub in ("core", "integrators", "interpolants", "couplings", "samplers",
                "losses", "models", "datasets", "ops", "parallel", "utils"):
        mod = getattr(torchebm_tpu, sub)
        names = sorted(getattr(mod, "__all__", []))
        md.append(f"- **{sub}**: " + ", ".join(f"`{n}`" for n in names))
    md.append("")
    return "\n".join(md)


def gen_composition() -> str:
    """The six-axis composition map (reference README.md:39-60) as mermaid."""
    return "\n".join(
        [
            "# Composition map",
            "",
            "A generative method = a configuration of six composable axes:",
            "",
            "```mermaid",
            "graph LR",
            '  E["energy / field<br/>(core.energies, models)"]',
            '  I["interpolant<br/>(interpolants)"]',
            '  C["coupling<br/>(couplings)"]',
            '  O["objective<br/>(losses)"]',
            '  S["sampler<br/>(samplers)"]',
            '  N["integrator<br/>(integrators)"]',
            "  O -->|uses| S",
            "  O -->|or uses| C",
            "  O -->|interpolates via| I",
            "  S -->|steps with| N",
            "  N -->|evaluates field of| E",
            "  S -->|derives drift from| E",
            "```",
            "",
            "Two training wirings: **sampler-free** (score/flow/EqM: couple →",
            "draw t → interpolate → regress) and **sampler-based** (CD family,",
            "EM joint phase: the sampler draws negatives from the current model",
            "every step). Generation is always sampler → integrator →",
            "model-derived field.",
            "",
        ]
    )


def _tree(base, classes, indent=0) -> list:
    lines = [f"{'    ' * indent}- `{base.__name__}` — {_first_line(base)}"]
    for cls in sorted(classes, key=lambda c: c.__name__):
        if cls.__bases__ and cls.__bases__[0] is base:
            lines += _tree(cls, classes, indent + 1)
    return lines


def gen_class_trees() -> str:
    from torchebm_tpu.couplings import BaseCoupling
    from torchebm_tpu.core import Energy
    from torchebm_tpu.core.schedulers import BaseScheduler
    from torchebm_tpu.integrators import BaseIntegrator
    from torchebm_tpu.interpolants import BaseInterpolant
    from torchebm_tpu.losses.base import BaseLoss
    from torchebm_tpu.samplers import BaseSampler

    md = ["# Class hierarchies", ""]
    for base in (Energy, BaseScheduler, BaseIntegrator, BaseInterpolant,
                 BaseCoupling, BaseSampler, BaseLoss):
        subclasses = _all_subclasses(base)
        md += [f"## {base.__name__}", ""]
        md += _tree(base, subclasses)
        md.append("")
    return "\n".join(md)


def _all_subclasses(base):
    out, stack = set(), [base]
    while stack:
        cls = stack.pop()
        for sub in cls.__subclasses__():
            if sub not in out:
                out.add(sub)
                stack.append(sub)
    return out


def _import_everything():
    """Force-import all subpackages so __subclasses__ is complete."""
    import torchebm_tpu

    for sub in torchebm_tpu._SUBMODULES:
        getattr(torchebm_tpu, sub)
    import torchebm_tpu.samplers.flow  # noqa: F401


def _generators():
    """Marker name → content fn for in-page injection."""
    import gen_examples

    return {
        "components": gen_components,
        "composition": gen_composition,
        "class_trees": gen_class_trees,
        # gallery links resolve relative to docs/, where injected pages live
        "gallery": lambda: gen_examples.gen_gallery(link_prefix="generated/examples/"),
    }


def _strip_h1(md: str) -> str:
    """Drop a leading H1 so injected content nests inside the host page."""
    lines = md.split("\n")
    if lines and lines[0].startswith("# "):
        lines = lines[1:]
    return "\n".join(lines).strip("\n")


def inject_pages(docs_dir: str = DOCS_DIR) -> list:
    """Rewrite every ``<!-- GEN:name -->`` block in the committed doc pages.

    Returns the list of files that changed. Unknown marker names raise — a
    typo'd marker silently left stale is exactly the drift this prevents.
    """
    gens = _generators()
    changed = []
    for fname in sorted(os.listdir(docs_dir)):
        path = os.path.join(docs_dir, fname)
        if not fname.endswith(".md") or not os.path.isfile(path):
            continue
        text = open(path).read()

        def repl(m):
            name = m.group(2)
            if name not in gens:
                raise KeyError(
                    f"{fname}: unknown GEN marker {name!r} "
                    f"(known: {sorted(gens)})"
                )
            return f"{m.group(1)}\n\n{_strip_h1(gens[name]())}\n\n{m.group(4)}"

        new = MARKER.sub(repl, text)
        if new != text:
            with open(path, "w") as f:
                f.write(new)
            changed.append(fname)
    return changed


def main() -> None:
    _import_everything()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, fn in (
        ("components.md", gen_components),
        ("composition.md", gen_composition),
        ("class_trees.md", gen_class_trees),
    ):
        path = os.path.join(OUT_DIR, name)
        with open(path, "w") as f:
            f.write(fn())
        print(f"wrote {path}")
    for fname in inject_pages():
        print(f"injected {fname}")


# mkdocs hook entry point (when mkdocs is available)
def on_files(files, config):  # pragma: no cover
    main()
    return files


if __name__ == "__main__":
    main()
