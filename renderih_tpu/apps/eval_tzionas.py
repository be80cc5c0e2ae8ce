"""Tzionas hand-hand evaluation (reference `apps/eval_tzionas.py`).

Same metric stack as eval_interhand over a packed Tzionas dataset
(tools/dataset_gen/tzionas_gen.py):

  python -m renderih_tpu.apps.eval_tzionas --ckpt C --data packed_tzionas/
"""

from renderih_tpu.apps.eval_interhand import main as _main


def main(argv=None):
    _main(argv)


if __name__ == "__main__":
    main()
