"""diffusion_image_editing_tpu — a TPU-native (JAX/Flax/Pallas) framework for
editing real and synthetic images with pretrained denoising diffusion models
and gradient guidance.

From-scratch rebuild of the capabilities of
`JohanLundberg12/diffusion-image-editing` (PyTorch/diffusers/CUDA), redesigned
TPU-first: jitted `lax.scan` denoising/inversion loops, `jax.grad` guidance
folded into the scan, Pallas kernels for attention / GroupNorm / activated
batch norm, and `jax.sharding` meshes for data-parallel training and batched
edit sweeps.
"""

__version__ = "0.1.0"
