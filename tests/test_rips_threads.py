"""Multithreaded native reduction == single-threaded == python oracle.

TDAX_THREADS activates the apparent-pair claim path (map-free, parallel
phase A) in both native engines; it is latched per process, so the
threaded run happens in a subprocess and its diagrams are diffed against
the in-process single-threaded result.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tdax.ops.rips.native import available

_SCRIPT = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize overrides env
import numpy as np
rng = np.random.default_rng(7)
x = rng.normal(size=(48, 5))
from tdax.ops.rips import rips
out = rips(x, maxdim=2, backend="native")
print(json.dumps([d.tolist() for d in out["dgms"]]))

from tdax.pipeline.scale import rips_at_scale_sparse
out = rips_at_scale_sparse(x.astype(np.float32), maxdim=2, target_degree=20)
print(json.dumps([d.tolist() for d in out["dgms"]]))

# large enough (>= 4096 dim-1 columns) to engage the blocked-parallel
# phase B commit protocol, not just parallel phase A
x2 = rng.normal(size=(400, 6)).astype(np.float32)
out = rips_at_scale_sparse(x2, maxdim=1, target_degree=24,
                           degree_headroom=16.0)
print(json.dumps([d.tolist() for d in out["dgms"]]))
"""


def _run_engines(threads: str) -> tuple[list, list]:
    # both runs happen in CPU subprocesses so the comparison isolates the
    # thread count: the parent may be on TPU (TDAX_TEST_TPU), whose f32
    # reduction order differs from CPU at the last ulp
    env = dict(os.environ, TDAX_THREADS=threads, TDAX_FORCE_CPU="1")
    proc = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                          capture_output=True, text=True, timeout=300,
                          cwd=os.path.dirname(os.path.dirname(__file__)))
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("[")]
    return [json.loads(l) for l in lines[-3:]]


@pytest.mark.skipif(not available(), reason="native engine unavailable")
def test_threaded_engines_match_single_threaded(tmp_path):
    mt = _run_engines("4")
    st = _run_engines("1")
    for case_mt, case_st in zip(mt, st):
        for got, want in zip(case_mt, case_st):
            np.testing.assert_allclose(np.asarray(got).reshape(-1, 2),
                                       np.asarray(want).reshape(-1, 2),
                                       rtol=0, atol=0)
