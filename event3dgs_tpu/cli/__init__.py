"""Command-line entry points mirroring the reference scripts:

- ``python -m event3dgs_tpu.cli.train``   ← reference `train.py`
- ``python -m event3dgs_tpu.cli.render``  ← reference `render.py`
- ``python -m event3dgs_tpu.cli.evaluate``← reference `eval.py`
- ``python -m event3dgs_tpu.cli.metrics`` ← reference `metrics.py`
"""
