"""ROVR-TPU: a TPU-native (JAX / XLA / Pallas / pjit) framework for
reinforcement-learning-optimized video reconstruction.

Re-designed from scratch with the capabilities of the reference
`arjvik/Reinformcement-Optimized-Video-Reconstruction` (see SURVEY.md):
policy networks select which frame to reconstruct and which two context
frames to condition on; a UNet "local network" inpaints the selected frame;
rewards come from LPIPS perceptual-loss improvement plus an optical-flow
preservation signal; policies are optimized with PPO-clip.

Everything here is TPU-first: NHWC layouts, bfloat16 compute on the MXU,
functional state threaded through `jax.jit`/`lax.scan`, sharding via
`jax.sharding.Mesh` + `shard_map`, and Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"

from rovr_tpu import config  # noqa: F401
