"""Evaluation metrics (reference: run-nerf.py:108-191 evaluation())."""

from fsnerf_tpu.eval.metrics import psnr, ssim, evaluate_frames
