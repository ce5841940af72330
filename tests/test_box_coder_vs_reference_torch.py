"""Box coder golden parity vs the reference's box_coder_utils (torch-cpu):
ResidualCoder encode/decode (plain and sincos) and PointResidualCoder."""
import importlib.util
from pathlib import Path

import numpy as np
import pytest

from com_tpu.ops.boxes import PointResidualCoder, ResidualCoder

REF = Path("/root/reference/pcdet/utils/box_coder_utils.py")


def _load():
    spec = importlib.util.spec_from_file_location("ref_box_coder", str(REF))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _boxes(rng, n):
    b = np.concatenate([
        rng.uniform(-40, 40, (n, 3)),
        rng.uniform(1, 5, (n, 3)),
        rng.uniform(-np.pi, np.pi, (n, 1)),
    ], axis=1).astype(np.float32)
    return b


@pytest.mark.skipif(not REF.exists(), reason="reference checkout unavailable")
@pytest.mark.parametrize("sincos", [False, True])
def test_residual_coder_matches_reference(sincos):
    import torch

    mod = _load()
    rng = np.random.RandomState(0)
    boxes, anchors = _boxes(rng, 50), _boxes(rng, 50)

    ref = mod.ResidualCoder(encode_angle_by_sincos=sincos)
    enc_ref = ref.encode_torch(torch.from_numpy(boxes),
                               torch.from_numpy(anchors)).numpy()
    ours = ResidualCoder(encode_angle_by_sincos=sincos)
    enc = np.asarray(ours.encode(boxes, anchors))
    np.testing.assert_allclose(enc, enc_ref, rtol=1e-4, atol=1e-5)

    dec_ref = ref.decode_torch(torch.from_numpy(enc_ref),
                               torch.from_numpy(anchors)).numpy()
    dec = np.asarray(ours.decode(enc, anchors))
    np.testing.assert_allclose(dec, dec_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not REF.exists(), reason="reference checkout unavailable")
def test_point_residual_coder_matches_reference(monkeypatch):
    import torch

    # the reference moves its mean_size tensor to CUDA in __init__
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    mod = _load()
    rng = np.random.RandomState(1)
    boxes = _boxes(rng, 40)
    points = boxes[:, :3] + rng.uniform(-1, 1, (40, 3)).astype(np.float32)
    classes = rng.randint(1, 4, 40)
    mean_size = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]

    ref = mod.PointResidualCoder(use_mean_size=True, mean_size=mean_size)
    enc_ref = ref.encode_torch(torch.from_numpy(boxes),
                               torch.from_numpy(points),
                               torch.from_numpy(classes)).numpy()
    ours = PointResidualCoder(use_mean_size=True, mean_size=mean_size)
    enc = np.asarray(ours.encode(boxes, points, classes))
    np.testing.assert_allclose(enc, enc_ref, rtol=1e-4, atol=1e-5)

    dec_ref = ref.decode_torch(torch.from_numpy(enc_ref),
                               torch.from_numpy(points),
                               torch.from_numpy(classes)).numpy()
    dec = np.asarray(ours.decode(enc, points, classes))
    np.testing.assert_allclose(dec, dec_ref, rtol=1e-4, atol=1e-4)
