"""MPPNet: multi-frame temporal detection via proposal trajectory refinement.

Rebuild of the reference MPPNet family (pcdet/models/detectors/mppnet.py,
roi_heads/mppnet_head.py, model_utils/mppnet_utils.py).
"""
from .mppnet_head import MPPNetHead, generate_trajectory, mppnet_loss  # noqa: F401
from .targets import MPPNetTargets, sample_mppnet_targets  # noqa: F401
from .transformer import MPPNetTransformer  # noqa: F401
from .mppnet_e2e import (  # noqa: F401
    MemoryBank,
    MPPNetHeadE2E,
    init_bank,
    mppnet_e2e_stream_step,
    push_bank,
)
