"""Run the REFERENCE's own test files against this package.

The reference test suite (tests/test_unit.py: ~115 tests, plus per-issue
regressions) is executed with ``ahocorasick`` aliased to
``pyahocorasick_tpu`` — the strongest possible statement of API parity.
Skipped when the reference tree isn't present.
"""

import os
import shutil
import subprocess
import sys

import pytest

REF_TESTS = "/root/reference/tests"
WORKDIR = "/tmp/reftests_auto/tests"  # nested: test_issue_9 reads ../README.rst

FILES = [
    "test_unit.py",
    "test_basic.py",
    "test_issue_5.py",
    "test_issue_8.py",
    "test_issue_9.py",
    "test_issue_10.py",
    "test_issue_19.py",
    "test_issue_26.py",
    "test_issue_50.py",
    "test_issue_53.py",
    "test_issue_56.py",
    "test_issue_133.py",
]

CONFTEST = '''
import os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
import pyahocorasick_tpu
sys.modules["ahocorasick"] = pyahocorasick_tpu
'''

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TESTS), reason="reference tests not available"
)


def test_reference_suite_passes():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(WORKDIR, exist_ok=True)
    for f in FILES + ["pytestingutils.py"]:
        src = os.path.join(REF_TESTS, f)
        if os.path.exists(src):
            shutil.copy(src, WORKDIR)
    # test_issue_9 reads <testdir>/../README.rst for its scan corpus
    ref_readme = os.path.join(os.path.dirname(REF_TESTS), "README.rst")
    if os.path.exists(ref_readme):
        shutil.copy(ref_readme, os.path.join(WORKDIR, os.pardir))
    with open(os.path.join(WORKDIR, "conftest.py"), "w") as fh:
        fh.write(CONFTEST.format(repo=repo))

    present = [f for f in FILES if os.path.exists(os.path.join(WORKDIR, f))]
    result = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider", *present],
        cwd=WORKDIR,
        capture_output=True,
        text=True,
        timeout=540,
    )
    tail = "\n".join(result.stdout.splitlines()[-15:])
    assert result.returncode == 0, tail
    assert " passed" in result.stdout, tail
