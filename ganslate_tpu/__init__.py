"""ganslate_tpu: TPU-native GAN image-to-image translation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`ganslate-team/ganslate` (reference at /root/reference): CycleGAN, Pix2Pix,
RevGAN and CUT training for 2D natural images and 3D medical volumes, designed
TPU-first — jit-compiled whole-iteration train steps, bf16 compute,
`jax.sharding.Mesh` data parallelism with XLA collectives, Pallas kernels for
the hot memory-bound ops, and a host-side prefetching data plane.
"""

__version__ = "0.1.0"
