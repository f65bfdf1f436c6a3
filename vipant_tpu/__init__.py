"""vipant_tpu — a TPU-native rebuild of VIP-ANT (vision/audio/language contrastive
learning; reference: zhaoyanpeng/vipant, NAACL 2022).

The compute path is JAX/XLA/Pallas; distribution is SPMD over a
``jax.sharding.Mesh``; the host-side data frontend has a C++ fast path.
Nothing in here depends on torch at runtime (torch is used only by the
checkpoint porter in :mod:`vipant_tpu.ckpt` and by test oracles).
"""

__version__ = "0.1.0"
