"""fastenhancer_tpu — TPU-native streaming speech enhancement framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the PyTorch
reference `aask1357/fastenhancer` (ICASSP 2026): training, on-the-fly mixing
data pipelines, a family of small causal enhancement models, objective-metric
evaluation, and frame-by-frame streaming inference via `jax.lax.scan` with an
explicit state carry.
"""

__version__ = "0.1.0"
