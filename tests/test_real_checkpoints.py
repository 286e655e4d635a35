"""Real pretrained checkpoints, when present, must pass their parity gates
(VERDICT: prove the stack on real community checkpoints).

Discovers files via scripts/parity_real.py (search dirs: $RVC_TPU_MODELS,
./models, /root/models, plus the reference-shipped mixer.ckpt) and runs
each through the matching torch-vs-ours gate. Offline environments with
no checkpoints mounted still exercise the mixer row.
"""
import os
import sys

import pytest

pytestmark = pytest.mark.parity

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from parity_real import GATES, classify, discover  # noqa: E402

_FOUND = [(p, classify(p)) for p in discover()]
_GATED = [(p, k) for p, k in _FOUND if k in GATES]


@pytest.mark.skipif(not _GATED, reason="no real checkpoints mounted")
@pytest.mark.parametrize("path,kind", _GATED,
                         ids=[os.path.basename(p) for p, _ in _GATED])
def test_real_checkpoint_gate(path, kind):
    result = GATES[kind](path)
    assert result["ok"], (path, kind, result)
