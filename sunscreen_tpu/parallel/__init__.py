"""Multi-chip parallelism: device meshes, sharding strategies, and the
distributed four-step NTT (SURVEY.md §2.5/§7 step 4 — the TPU-native
replacement for the reference's rayon/shared-memory parallelism)."""

from sunscreen_tpu.parallel.dntt import (  # noqa: F401
    DistributedNttPlan, make_distributed_negacyclic_mul)
