"""eval_interhand --torch_ckpt: consume a reference-layout .pth directly.

A reference user's released checkpoint ({'epoch', 'network': state_dict},
`core/lijun_trainer.py:343-355`) must evaluate without a manual
conversion step. Round trip: export our flagship variables to the
reference layout, torch.save them, and assert the CLI produces
numerically identical metrics to evaluating the original variables.
"""

import jax
import numpy as np
import pytest
import torch

from renderih_tpu.apps.eval_interhand import main as eval_main
from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.config import Config
from renderih_tpu.models import init_model
from renderih_tpu.utils.checkpoint_convert import export_reference_checkpoint


@pytest.mark.slow
def test_torch_ckpt_matches_direct_eval(tmp_path):
    cfg = Config()  # flagship: the released checkpoints' architecture
    assets = make_synthetic_assets(seed=0)
    _, variables = init_model(cfg, assets, jax.random.PRNGKey(0))

    sd = export_reference_checkpoint(
        variables["params"], variables.get("batch_stats", {}))
    pth = tmp_path / "reference.pth"
    torch.save(
        {"epoch": 7,
         "network": {k: torch.from_numpy(np.ascontiguousarray(v))
                     for k, v in sd.items()}}, pth)

    # baseline: same seed-0 init evaluated directly (eval_interhand with
    # no checkpoint arg uses init_model(seed 0) internally)
    base = eval_main(["--synthetic", "--bs", "32"])
    conv = eval_main(["--synthetic", "--bs", "32", "--torch_ckpt", str(pth)])

    for key in ("mpjpe_mm", "mpvpe_mm", "pa_mpjpe_mm", "double_mpjpe_mm"):
        np.testing.assert_allclose(conv[key], base[key], rtol=1e-4,
                                   atol=1e-3), key
