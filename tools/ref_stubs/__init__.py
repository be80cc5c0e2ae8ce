"""Import-time stand-ins that let the reference PyTorch model run on this
host (CPU-only, no torchvision/yacs/mmcv wheels installed).

Used exclusively by tools/parity_vs_reference.py to execute the reference
`HandNET_GCN` forward as the golden oracle for cross-framework parity.
Each stub implements only the surface the reference imports, with
state_dict naming identical to the real packages (required so converted
checkpoints keep their key layout).
"""
