"""Native CRF: thread-count determinism + optional pydensecrf cross-check.

The splat is parallelized over lattice points with per-point pixel-order
summation (native/densecrf.cpp), which must make the output bit-identical
for ANY OMP thread count — including 1, i.e. also identical to the fully
serial implementation.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

_SCRIPT = r"""
import sys
sys.path.insert(0, {root!r})
import numpy as np
from excel_tpu.crf import DenseCRF
rng = np.random.default_rng(0)
img = np.zeros((61, 83, 3), np.uint8)
img[:, :40] = (170, 60, 50)
img[:, 40:] = (40, 80, 190)
img += rng.integers(0, 10, img.shape).astype(np.uint8)
logits = rng.standard_normal((5, 61, 83)).astype(np.float32)
probs = np.exp(logits - logits.max(0)); probs /= probs.sum(0)
q = DenseCRF(iter_max=4)(img, probs.astype(np.float32))
np.save(sys.argv[1], q)
"""


def _run_with_threads(tmp_path, n):
    out = str(tmp_path / f"q_{n}.npy")
    env = dict(os.environ, OMP_NUM_THREADS=str(n), JAX_PLATFORMS="cpu")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(root=root), out],
        capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stderr
    return np.load(out)


@pytest.mark.slow
def test_crf_bit_identical_across_thread_counts(tmp_path):
    q1 = _run_with_threads(tmp_path, 1)
    q3 = _run_with_threads(tmp_path, 3)
    q8 = _run_with_threads(tmp_path, 8)
    np.testing.assert_array_equal(q1, q3)
    np.testing.assert_array_equal(q1, q8)


@pytest.mark.crf_oracle
def test_crf_against_pydensecrf():
    """Numerical cross-check against the reference's actual native dep
    (utils/dcrf.py wraps pydensecrf). Auto-skips where pydensecrf is not
    installed (this environment); runs wherever it is."""
    dcrf = pytest.importorskip("pydensecrf.densecrf")
    if getattr(dcrf, "__excel_stub__", False):
        pytest.skip("pydensecrf stubbed by ref_oracle (not a real install)")
    from pydensecrf.utils import unary_from_softmax

    from excel_tpu.crf import DenseCRF

    rng = np.random.default_rng(1)
    H, W, C = 49, 57, 4
    img = np.zeros((H, W, 3), np.uint8)
    img[:25] = (200, 40, 40)
    img[25:] = (30, 30, 180)
    img += rng.integers(0, 8, img.shape).astype(np.uint8)
    logits = rng.standard_normal((C, H, W)).astype(np.float32) * 2
    probs = np.exp(logits - logits.max(0))
    probs /= probs.sum(0)

    # reference DenseCRF parameterization (utils/dcrf.py:42-68)
    d = dcrf.DenseCRF2D(W, H, C)
    d.setUnaryEnergy(unary_from_softmax(probs))
    d.addPairwiseGaussian(sxy=1, compat=3)
    d.addPairwiseBilateral(sxy=67, srgb=3, rgbim=np.ascontiguousarray(img),
                           compat=4)
    ref_q = np.asarray(d.inference(10)).reshape(C, H, W)

    ours = DenseCRF(iter_max=10)(img, probs)
    # same model, independent implementations: argmax labels must agree on
    # effectively all pixels and the marginals closely
    agree = (ref_q.argmax(0) == ours.argmax(0)).mean()
    assert agree > 0.99, agree
    np.testing.assert_allclose(ours, ref_q, atol=0.05)
