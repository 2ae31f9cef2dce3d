"""Examples-as-integration-tests: discover every meta.yaml, smoke-run its entrypoint.

Mirrors ``/root/reference/tests/examples/test_examples_smoke.py:1-60``: each
example runs as a subprocess on CPU with ``TORCHEBM_SMOKE=1`` (examples shrink
their iteration counts); only the exit code is asserted. Marked ``examples``
— deselected by default (pyproject addopts), run with ``-m examples``.
"""

import os
import subprocess
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "examples")


def _parse_meta(path):
    """Minimal YAML subset parser (flat keys + one nested 'ci' block)."""
    meta, section = {}, None
    for line in open(path):
        raw = line.rstrip()
        if not raw or raw.lstrip().startswith("#"):
            continue
        indent = len(raw) - len(raw.lstrip())
        key, _, value = raw.strip().partition(":")
        value = value.strip()
        if indent == 0:
            if value == "":
                section = key
                meta[key] = {}
            else:
                section = None
                meta[key] = value
        elif section:
            meta[section][key] = value
    return meta


def discover():
    cases = []
    for root, _, files in os.walk(EXAMPLES_DIR):
        if "meta.yaml" in files:
            meta = _parse_meta(os.path.join(root, "meta.yaml"))
            cases.append((os.path.relpath(root, EXAMPLES_DIR), root, meta))
    return sorted(cases)


CASES = discover()


def test_examples_exist():
    assert len(CASES) >= 8


def test_meta_contract():
    for name, root, meta in CASES:
        for field in ("title", "summary", "order", "difficulty", "entrypoint"):
            assert field in meta, f"{name}: meta.yaml missing {field!r}"
        assert os.path.exists(os.path.join(root, meta["entrypoint"])), name


@pytest.mark.examples
@pytest.mark.parametrize("name,root,meta", CASES, ids=[c[0] for c in CASES])
def test_example_smoke(name, root, meta):
    if str(meta.get("ci", {}).get("skip", "")).lower() == "true":
        pytest.skip("meta.yaml ci.skip")
    timeout = int(meta.get("ci", {}).get("timeout", 300))
    env = dict(os.environ, TORCHEBM_SMOKE="1", JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(
                   [os.path.abspath(os.path.join(EXAMPLES_DIR, "..")),
                    os.environ.get("PYTHONPATH", "")]))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, meta["entrypoint"])],
        cwd=root, env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, f"{name} failed:\n{proc.stdout}\n{proc.stderr}"
