"""The examples/ programs run end-to-end (the reference's example_c /
example_cpp / Example.java smoke-test role, SURVEY.md section 4.1)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = ["example_c_api.py", "example_cpp_api.py", "example_ssw_lib.py"]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name):
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import runpy, sys; sys.argv = ['x'];"
         f"runpy.run_path({os.path.join(REPO, 'examples', name)!r},"
         "run_name='__main__')"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.strip(), "example printed nothing"
