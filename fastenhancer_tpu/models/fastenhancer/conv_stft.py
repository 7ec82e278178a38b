"""FastEnhancer conv_stft variant: STFT/iSTFT as explicit DFT matmuls.

The reference expresses the front-end as conv1d with a DFT-matrix kernel so
the exported ONNX graph contains no FFT ops (reference:
models/fastenhancer/conv_stft/model.py:55-153). On TPU the same formulation
is simply the `method="matmul"` mode of our STFTConfig — a windowed-DFT
matmul that lowers straight onto the MXU — so this variant is the default
model with the matmul front-end selected. The network and parameters are
identical (the reference's two variants share checkpoints too).
"""
from __future__ import annotations

import dataclasses

from .default import Model as DefaultModel


class Model(DefaultModel):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.stft_cfg = dataclasses.replace(self.stft_cfg, method="matmul")
