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

import os as _os

import jax as _jax

# Exact 64-bit integer arithmetic is the foundation of every RNS kernel
# (SURVEY.md §7 "Hard parts"). x64 must be enabled before any array is made.
_jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: FHE kernel graphs are large (every
# NTT unrolls log N stages) and parameter sets are stable, so caching
# compiles across processes cuts cold-start from minutes to seconds.
if not _jax.config.jax_compilation_cache_dir:
    _cache = _os.environ.get(
        "SUNSCREEN_TPU_XLA_CACHE",
        _os.path.expanduser("~/.cache/sunscreen_tpu_xla"))
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"
