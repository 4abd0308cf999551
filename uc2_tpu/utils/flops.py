"""Shared matmul-FLOPs model + chip roofline constants.

Single source of truth for the roofline accounting that every measured
rate must print next to itself (DESIGN.md measurement post-mortems #1-#3:
twice a benchmark harness let XLA dead-code part of the program and the
resulting impossible rate went unflagged until a FLOPs cross-check).
bench.py and scripts/tpu_measure.py both import from here so the model
cannot drift between the headline JSON and the measurement tool.

Import-light on purpose (no jax/numpy): bench.py evaluates these at module
scope before jax initializes the axon backend.
"""

CHIP_CALIB_TFLOPS = 125.0   # sustained bf16 8192^3 matmul on this chip
                            # (BASELINE.md round-1 calibration row)
CHIP_PEAK_TFLOPS = 197.0    # v5e bf16 peak; per-shape matmuls measured up
                            # to 176 TF/s (kernel_lab ce roofline arm), so
                            # 125-197 is high-but-possible and only >197
                            # is physically impossible


def encoder_fwd_flops_per_pair(L, n_layers=12, H=768, F=3072):
    """Encoder forward matmul FLOPs for one (text, image) pair at joint
    length L: per layer 4 H*H projection matmuls + 2 H*F FFN matmuls +
    QK^T/PV."""
    per_layer = 2 * L * H * (4 * H) + 2 * L * (2 * H * F) + 4 * L * L * H
    return n_layers * per_layer


def grad_flops_per_example(Lt, Nb, M, n_layers=12, H=768, F=3072,
                           V=250002, img_dim=2048):
    """Matmul FLOPs for ONE example's full mlm grad step (fwd + bwd-acts +
    bwd-weights ~= 3x fwd). Printed as implied TF/s next to every train
    RESULT so roofline-violating rates self-flag: round 3's 26.5
    grad-steps/s implied ~192 TF/s (> the chip's own 125 TF/s sustained
    calibration) because the harness kept only one gradient leaf live and
    XLA dead-coded most of the backward (VERDICT r3 weak #1)."""
    enc = encoder_fwd_flops_per_pair(Lt + Nb, n_layers=n_layers, H=H, F=F)
    img_emb = 2 * Nb * img_dim * H
    head = 2 * M * H * H + 2 * M * H * V
    return 3 * (enc + img_emb + head)
