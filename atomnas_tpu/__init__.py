"""atomnas_tpu — a TPU-native neural architecture search framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the public
AtomNAS framework (meijieru/AtomNAS, ICLR 2020): single-stage NAS on a
MobileNetV2-style supernet whose inverted-residual expansions are decomposed
into atomic blocks of mixed depthwise kernels (3x3/5x5/7x7), trained
end-to-end while a resource-aware L1 penalty on BatchNorm scales drives
dynamic network shrinkage.

Key architectural departures from the reference (see SURVEY.md):
  * static channel masks + periodic re-slice-and-recompile instead of
    in-place module surgery (XLA static shapes);
  * pjit/GSPMD data parallelism over a `jax.sharding.Mesh` instead of
    NCCL DDP — batch-norm moments computed over the globally sharded batch
    are sync-BN for free under GSPMD;
  * host tf.data/grain input pipeline instead of NVIDIA DALI;
  * Pallas fused kernels for the hot epilogues instead of cuDNN.
"""

__version__ = "0.1.0"
