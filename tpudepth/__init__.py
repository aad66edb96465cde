"""tpudepth — a TPU-native monocular depth estimation framework.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of
``LuizGuzzo/Monocular_Depth_Estimation`` (NYU-Depth-V2 encoder-decoder depth
stacks): the model zoo (MobileNetV3 encoder x {DenseDepth, U-Net, SAM
window-attention, NewCRF shifted-window-attention} decoders plus GuideDepth /
DDRNet-23-slim), the SSIM/SILog/L1/gradient losses, the Eigen/Garg-crop
evaluation protocols, zip-in-memory NYU data pipeline, training with
checkpoint/resume and TensorBoard logging, and an AOT-compiled inference
harness standing in for the reference's TensorRT path.

Design is TPU-first: NHWC layouts, bf16 matmul policy with f32 accumulation,
static shapes everywhere, data-parallel training over a ``jax.sharding.Mesh``
with XLA-inserted collectives, and Pallas kernels for the fused hot ops.
"""

__version__ = "0.1.0"
