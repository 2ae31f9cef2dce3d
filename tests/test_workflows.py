"""CI workflow definitions stay consistent with the repo they invoke.

The workflows can't execute here; this pins the contract instead: valid
YAML, jobs with runners and steps, and every `python <script>` entry point
they call actually exists in the tree (a renamed harness file would
otherwise break CI silently).
"""

import os
import re

import pytest

yaml = pytest.importorskip("yaml")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WF_DIR = os.path.join(ROOT, ".github", "workflows")
EXPECTED = {"ci.yml", "benchmarks.yml", "docs_ci.yml", "publish.yml", "tag-release.yml"}


def _workflows():
    return sorted(os.listdir(WF_DIR))


def test_expected_workflow_surface():
    assert EXPECTED.issubset(set(_workflows()))


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_workflow_is_valid(name):
    with open(os.path.join(WF_DIR, name)) as f:
        doc = yaml.safe_load(f)
    assert doc.get("jobs"), name
    for job_name, job in doc["jobs"].items():
        assert "runs-on" in job and job.get("steps"), (name, job_name)


def test_referenced_scripts_exist():
    pat = re.compile(r"python\s+(-m\s+)?([\w./_-]+)")
    missing = []
    for name in EXPECTED:
        text = open(os.path.join(WF_DIR, name)).read()
        for is_module, target in pat.findall(text):
            if is_module:
                mod = target.replace(".", "/")
                if not (
                    os.path.exists(os.path.join(ROOT, mod + ".py"))
                    or os.path.isdir(os.path.join(ROOT, mod))
                    or target in ("pip", "build", "pytest")
                ):
                    missing.append((name, target))
            elif target.endswith(".py") and not os.path.exists(
                os.path.join(ROOT, target)
            ):
                missing.append((name, target))
    assert not missing, missing
