"""eda_dm_tpu — TPU-native post-training quantization for diffusion models.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of BienLuky/EDA-DM
(Enhanced Distribution Alignment for Post-Training Quantization of Diffusion
Models, arXiv 2401.04585): fake-quant model wrapping, TDAC timestep-aware
calibration, MSE scale search, AdaRound + FBR block reconstruction, and
quantized DDIM/PLMS/DPM-Solver sampling — designed for TPU meshes rather than
translated from the reference's single-GPU PyTorch.
"""

__version__ = "0.1.0"

from . import quant  # noqa: F401
from .api import (quantize_model, calibrate, reconstruct,  # noqa: F401
                  export_for_serving, save_bundle, load_bundle)
