"""sunscreen_tpu — a TPU-native framework for privacy-preserving computation.

Brand-new implementation (not a port) with the capabilities of
Sunscreen-tech/Sunscreen: a BFV FHE compiler + runtime, TFHE library, ZKP
compiler with Bulletproofs backend, SDLP lattice proofs, and linked proofs.
The compute path is JAX/XLA/Pallas; ciphertext math runs as jitted array
programs over RNS polynomial rings, sharded across TPU meshes with
jax.sharding.

Reference parity map: see SURVEY.md at the repo root. Where docstrings in
this package cite `file:line`, they refer to the reference checkout under
/root/reference (Sunscreen @ 2025-09-05) for behavioral parity only.
"""

import jax as _jax

# Exact 64-bit integer arithmetic is the foundation of every RNS kernel
# (SURVEY.md §7 "Hard parts"). x64 must be enabled before any array is made.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
