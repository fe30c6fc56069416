# Compute-path ops: fused attention (XLA + Pallas), image preprocessing as matmuls.
