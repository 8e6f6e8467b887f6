"""h36m gesture-autoencoder CLI (the reference's FGD-net training path,
run_ted.py:126 checkpoint dir + h36m_loader.py)."""

import numpy as np
import pytest


def _fake_h36m_npz(path, rng):
    # {subject: {action: (frames, 32, 3)}} — reference h36m_loader.py:31
    positions = {}
    for subject in ["S1", "S9"]:      # one train subject, one test subject
        actions = {}
        for a in range(2):
            base = rng.standard_normal((1, 32, 3)) * 0.2
            walk = np.cumsum(rng.standard_normal((400, 32, 3)) * 0.003,
                             axis=0)
            actions[f"act{a}"] = (base + walk).astype(np.float32)
        positions[subject] = actions
    np.savez(path, positions_3d=np.array(positions, dtype=object))


@pytest.mark.slow
def test_train_h36m_ae_and_export(tmp_path):
    from hop_tpu.cli.train_h36m_ae import main
    from hop_tpu.eval.export_eval_net import export

    npz = str(tmp_path / "h36m.npz")
    _fake_h36m_npz(npz, np.random.default_rng(0))
    ck = str(tmp_path / "ck")
    assert main(["--npz", npz, "--checkpoint-dir", ck,
                 "--epochs", "2", "--batch-size", "8"]) == 0

    out = str(tmp_path / "evalnet.npz")
    export(ck, out)
    from hop_tpu.cli.common import make_fgd_evaluator
    from hop_tpu.config import ted_config
    ev = make_fgd_evaluator(ted_config(), 4, out)
    assert ev.trained
