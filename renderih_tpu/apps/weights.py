"""Shared eval-weight resolution for the CLI apps.

Every evaluation/demo entry point accepts the same three sources:
  --ckpt       an orbax TrainState checkpoint (ours), optionally --ema
  --torch_ckpt a reference-layout .pth (bare state_dict or the
               reference's {'epoch','network'} save,
               `core/lijun_trainer.py:343-355`)
  neither      the seed-0 initialization (smoke/synthetic runs)
"""

from __future__ import annotations

from renderih_tpu.config import Config


def add_weight_args(parser) -> None:
    parser.add_argument("--ckpt", type=str, default=None,
                        help="orbax TrainState checkpoint directory")
    parser.add_argument("--ema", action="store_true",
                        help="evaluate the EMA params from --ckpt "
                             "(requires train.ema_decay > 0 in the cfg)")
    parser.add_argument("--torch_ckpt", type=str, default=None,
                        help="reference .pth checkpoint; converted "
                             "in-memory via utils/checkpoint_convert")


def load_eval_variables(cfg: Config, init_variables: dict, args) -> dict:
    """Resolve {'params', 'batch_stats'} from the parsed weight args."""
    if args.ckpt:
        from renderih_tpu.train.state import (
            create_train_state,
            restore_checkpoint,
        )

        state = create_train_state(cfg, init_variables, steps_per_epoch=1)
        state = restore_checkpoint(args.ckpt, state)
        params = state.params
        if args.ema:
            assert state.ema_params is not None, (
                "--ema needs a checkpoint trained with train.ema_decay > 0")
            params = state.ema_params
        return {"params": params, "batch_stats": state.batch_stats}
    if args.ema:
        raise SystemExit("--ema requires --ckpt")
    if args.torch_ckpt:
        import torch

        from renderih_tpu.utils.checkpoint_convert import (
            convert_reference_checkpoint,
        )

        raw = torch.load(args.torch_ckpt, map_location="cpu",
                         weights_only=True)
        sd = raw["network"] if "network" in raw else raw
        params, batch_stats = convert_reference_checkpoint(
            sd, encoder=cfg.model.encoder)
        return {"params": params, "batch_stats": batch_stats}
    return init_variables
