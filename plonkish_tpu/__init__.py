"""plonkish_tpu — a TPU-native PLONKish proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
`amit0365/plonkish` Rust reference: HyperPlonk (multilinear, sum-check based)
proving, multilinear polynomial commitment schemes, Protostar/Sangria folding,
and a circuit frontend — with all O(2^k) field arithmetic running as
vectorized limb-tensor kernels on TPU and protocol glue on host.
"""

__version__ = "0.1.0"
