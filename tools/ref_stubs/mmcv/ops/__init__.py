"""`mmcv.ops.sigmoid_focal_loss` import target
(`common/utils/focal_loss.py:4`). Only reached at call time when
`cfg.render` is on; the parity harness keeps rendering off, so a loud
failure is the right behavior if it is ever invoked.
"""


def sigmoid_focal_loss(*args, **kwargs):
    raise NotImplementedError(
        "mmcv CUDA focal loss is stubbed out on this host; "
        "use the pure-python fallback in common/utils/focal_loss.py")
