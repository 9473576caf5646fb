"""rgbd_gan_tpu: a TPU-native JAX framework with the capabilities of RGBD-GAN.

Re-implements the full capability surface of the reference Chainer/CuPy
implementation (nogu-atsu/RGBD-GAN) as an idiomatic JAX / XLA / Pallas stack:

- ``core``      config system (yml schema preserved), progressive-stage schedule
- ``geometry``  camera math, 6-DoF prior, differentiable warps + bilinear gather
- ``nn``        equalized-LR primitives, AdaIN, resampling, spectral norm
- ``models``    DCGAN / StyleGAN / DeepVoxels generators, PGGAN discriminator
- ``train``     losses (adv, R1 GP, 3D consistency), train steps, trainer loop
- ``parallel``  device mesh + data-parallel sharding (ICI collectives via XLA)
- ``data``      image -> images.npy cache -> host-sharded batches
- ``eval``      preview grids, Inception features, FID/IS
- ``ops``       Pallas TPU kernels for the irregular hot ops
"""

__version__ = "0.1.0"
