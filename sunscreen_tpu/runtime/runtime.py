"""Typed FHE runtime: keygen / encrypt / run / decrypt.

Replaces `sunscreen_runtime/src/runtime.rs` (`GenericRuntime`:
generate_keys :247-285, encrypt :424-529, run :310-416, decrypt
:145-208, measure_noise_budget :221-234) and the typed
Ciphertext/Plaintext wrappers (`src/lib.rs:135-241`). Where the
reference's `run` drives the rayon interpreter over SEAL FFI, here it
calls the lowered jitted XLA function (cached per program).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.bfv import get_context
from sunscreen_tpu.bfv import keys as bkeys
from sunscreen_tpu.bfv import ops as bops
from sunscreen_tpu.bfv.params import BfvParams
from sunscreen_tpu.compiler.compiler import CompiledFheProgram
from sunscreen_tpu.compiler.lower import lower_program
from sunscreen_tpu.math import sampling
from sunscreen_tpu.types.bfv_types import BfvType, resolve_type


class RuntimeError_(Exception):
    """Typed runtime failure (reference: `sunscreen_runtime/src/error.rs`)."""


class TooMuchNoise(RuntimeError_):
    """Noise budget exhausted — decryption would be wrong (reference:
    `runtime.rs:182-187`)."""


@dataclass
class Ciphertext:
    """Typed ciphertext: one or more BFV ciphertext arrays + type tag
    (reference: `Ciphertext`/`InnerCiphertext`, `src/lib.rs:161-210`)."""

    type_name: str
    cts: list  # list of uint64 [n_comp, k, N]
    params: BfvParams


@dataclass
class PublicKeySet:
    """Public key + optional relin/galois keys (reference: `PublicKey`
    struct bundling galois/relin keys, `src/keys.rs:25-53`)."""

    public_key: bkeys.PublicKey
    relin_key: bkeys.KswKey | None = None
    galois_keys: bkeys.GaloisKeys | None = None


@dataclass
class PrivateKey:
    sk: bkeys.SecretKey


class FheRuntime:
    """`Runtime::new_fhe` equivalent (`runtime.rs:829-917`)."""

    def __init__(self, params: BfvParams):
        self.params = params
        self.ctx = get_context(params)
        self._lowered: dict[int, object] = {}
        self._jit_cache: dict = {}

    def _jitted(self, name, fn):
        """Whole-flow jit — per-op dispatch to a (possibly tunneled) TPU
        is latency-bound, so keygen/encrypt/decrypt each compile to one
        XLA computation."""
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    # -- keys ----------------------------------------------------------------

    def generate_keys(self, seed: int | None = None, galois: bool = True,
                      relin: bool = True
                      ) -> tuple[PublicKeySet, PrivateKey]:
        """Generate secret/public/relin/galois keys.

        seed=None (the default) draws full OS entropy
        (`sampling.fresh_key`). Passing an integer seed is a
        deterministic TEST-ONLY mode — every caller with the same seed
        gets the same secret key.
        """
        ctx = self.ctx

        def build(key):
            sk = bkeys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
            pk = bkeys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
            rlk = bkeys.gen_relin_key(
                ctx, sk, jax.random.fold_in(key, 2)) if relin else None
            gks = bkeys.gen_galois_keys(
                ctx, sk, jax.random.fold_in(key, 3),
                bkeys.default_rotation_elements(ctx)) if galois else None
            return sk, pk, rlk, gks

        key = sampling.key_from_seed(seed)
        sk, pk, rlk, gks = self._jitted(
            ("keygen", galois, relin, seed is None), build)(key)
        return PublicKeySet(pk, rlk, gks), PrivateKey(sk)

    # -- encrypt / decrypt ---------------------------------------------------

    def encrypt(self, value: BfvType, public_key: PublicKeySet,
                seed: int | None = None) -> Ciphertext:
        tcls = type(value)
        polys = tcls.encode(value.value, self.params)
        if polys.ndim == 1:
            polys = polys[None, :]
        key = sampling.key_from_seed(seed)
        enc = self._jitted(("encrypt", seed is None),
                           lambda pk, p, k: bops.encrypt(
                               self.ctx, pk, p, k))
        cts = [enc(public_key.public_key, polys[i],
                   jax.random.fold_in(key, i))
               for i in range(polys.shape[0])]
        return Ciphertext(tcls._type_name(), cts, self.params)

    def _decrypt_and_noise(self, sk, c):
        return (bops.decrypt(self.ctx, sk, c),
                bops.noise_distance_words(self.ctx, sk, c))

    @staticmethod
    def _budget_from_words(words) -> float:
        m_hi, m_lo = words
        dist = (float(m_hi) * 2.0**-64 + float(m_lo) * 2.0**-128)
        dist = max(dist, 2.0**-127)
        return float(np.floor(-np.log2(2.0 * dist)))

    def decrypt(self, ct: Ciphertext, private_key: PrivateKey):
        tcls = resolve_type(ct.type_name)
        polys = []
        for c in ct.cts:
            fn = self._jitted(("decrypt", c.shape),
                              self._decrypt_and_noise)
            # one fetch for poly + noise words (a blocking fetch costs
            # a full tunnel round trip — see decrypt_many for the
            # multi-output batching)
            poly, words = jax.device_get(fn(private_key.sk, c))
            if self._budget_from_words(words) <= 0:
                raise TooMuchNoise("ciphertext noise budget exhausted")
            polys.append(np.asarray(poly))
        polys = np.stack(polys)
        return tcls.decode(polys if polys.shape[0] > 1 else polys[0],
                           self.params)

    def decrypt_many(self, cts: list, private_key: PrivateKey) -> list:
        """Decrypt several ciphertexts with ONE jitted call and ONE
        host fetch. Through the tunneled device a blocking fetch costs
        a full ~35 ms round trip and `decrypt` pays it per component —
        batching is the difference between a serving flow bound by
        compute and one bound by round trips. Falls back to per-ct
        decryption when component shapes differ."""
        import jax

        from sunscreen_tpu.types.bfv_types import resolve_type
        raws = [c for ct in cts for c in ct.cts]
        if not raws:
            return []
        shape = raws[0].shape
        if any(r.shape != shape for r in raws):
            return [self.decrypt(ct, private_key) for ct in cts]

        def batched(sk, stacked):
            return jax.vmap(
                lambda c: self._decrypt_and_noise(sk, c))(stacked)

        fn = self._jitted(("decrypt_many", len(raws), shape), batched)
        polys, words = fn(private_key.sk, jnp.stack(raws))
        polys, (w_hi, w_lo) = jax.device_get((polys, words))
        out = []
        i = 0
        for ct in cts:
            n = len(ct.cts)
            for j in range(n):
                if self._budget_from_words((w_hi[i + j],
                                            w_lo[i + j])) <= 0:
                    raise TooMuchNoise(
                        "ciphertext noise budget exhausted")
            group = np.asarray(polys[i:i + n])
            i += n
            tcls = resolve_type(ct.type_name)
            out.append(tcls.decode(group if n > 1 else group[0],
                                   self.params))
        return out

    def measure_noise_budget(self, ct: Ciphertext,
                             private_key: PrivateKey) -> float:
        from sunscreen_tpu import observability as obs
        budget = min(
            self._budget_from_words(
                self._jitted(("decrypt", c.shape),
                             self._decrypt_and_noise)(
                    private_key.sk, c)[1]) for c in ct.cts)
        obs.metrics.gauge_min("runtime.noise_budget_floor_bits", budget)
        return budget

    # -- run -----------------------------------------------------------------

    def _get_lowered(self, prog: CompiledFheProgram,
                     public_key: PublicKeySet):
        """Jitted executor for `prog` with the evaluation keys passed
        as ARGUMENTS (pytree leaves), not baked in: one compilation
        serves every key set with this structure. (Round-4 fix: the
        cache used to close over the FIRST caller's relin/galois keys,
        so a second key set silently ran with the first one's keys and
        'decrypted' to noise — the multi-tenant serving hazard.)"""
        import jax

        from sunscreen_tpu.bfv.keys import GaloisKeys, KswKey
        rlk = public_key.relin_key
        gks = public_key.galois_keys
        if prog.requires_relin_keys and rlk is None:
            raise RuntimeError_(
                f"program {prog.name!r} requires relin keys")
        if prog.requires_galois_keys and gks is None:
            raise RuntimeError_(
                f"program {prog.name!r} requires galois keys")
        has_rlk = rlk is not None
        elems = tuple(sorted(gks.keys)) if gks is not None else None
        cache_key = (id(prog), has_rlk, elems)
        if cache_key not in self._lowered:
            ctx = self.ctx

            def run_with_keys(key_leaves, *args):
                r = (KswKey(key_leaves[0], key_leaves[1])
                     if has_rlk else None)
                off = 2 if has_rlk else 0
                g = None
                if elems is not None:
                    g = GaloisKeys({
                        e: KswKey(key_leaves[off + 2 * i],
                                  key_leaves[off + 2 * i + 1])
                        for i, e in enumerate(elems)})
                return lower_program(prog, ctx, r, g, jit=False)(*args)

            self._lowered[cache_key] = jax.jit(run_with_keys)
        fn = self._lowered[cache_key]
        leaves = []
        if has_rlk:
            leaves += [rlk.k0, rlk.k1]
        if elems is not None:
            for e in elems:
                leaves += [gks[e].k0, gks[e].k1]
        return lambda *args: fn(leaves, *args)

    def run(self, prog: CompiledFheProgram, args: list,
            public_key: PublicKeySet) -> list[Ciphertext]:
        """Validates arg types against the signature then executes the
        jitted program (reference: `runtime.rs:310-416` + run.rs)."""
        from sunscreen_tpu import observability as obs
        obs.metrics.incr("runtime.programs_run")
        obs.metrics.incr(f"runtime.run.{prog.name}")
        if len(args) != len(prog.signature.arg_types):
            raise RuntimeError_(
                f"program {prog.name!r} expects "
                f"{len(prog.signature.arg_types)} args, got {len(args)}")
        flat = []
        for a, (tname, is_cipher) in zip(args, prog.signature.arg_types):
            if tname.startswith("[") and tname.endswith("]"):
                # fixed-size array input "[Cipher<T>; n]" — a list of
                # n ciphertexts (reference: sunscreen/tests/array.rs)
                inner_t, count = tname[1:-1].rsplit("; ", 1)
                if not isinstance(a, (list, tuple)) \
                        or len(a) != int(count):
                    raise RuntimeError_(
                        f"argument expects a list of {count} values "
                        f"({tname})")
                for el in a:
                    if not isinstance(el, Ciphertext):
                        raise RuntimeError_(
                            f"array elements must be Ciphertext "
                            f"({inner_t})")
                    flat.extend(el.cts)
                continue
            if is_cipher:
                if not isinstance(a, Ciphertext):
                    raise RuntimeError_(f"expected Ciphertext, got "
                                        f"{type(a).__name__}")
                inner = tname[len("Cipher<"):-1] \
                    if tname.startswith("Cipher<") else tname
                if a.type_name != inner:
                    raise RuntimeError_(
                        f"argument type mismatch: expected {tname}, got "
                        f"{a.type_name}")
                flat.extend(a.cts)
            else:
                polys = resolve_type(tname).encode(
                    a.value if isinstance(a, BfvType) else a, self.params)
                if polys.ndim == 1:
                    polys = polys[None, :]
                flat.extend(list(polys))
        fn = self._get_lowered(prog, public_key)
        outs = fn(*flat)
        # regroup outputs by signature
        results = []
        i = 0
        for (tname, _), n_ct in zip(prog.signature.ret_types,
                                    prog.signature.num_ciphertexts):
            results.append(Ciphertext(tname, outs[i:i + n_ct],
                                      self.params))
            i += n_ct
        return results


class ZkpRuntime:
    """ZKP prove/verify runtime (reference: `GenericRuntime` with Zkp
    marker; `prove`/`verify`: `runtime.rs:681-769`)."""

    def __init__(self, backend=None):
        from sunscreen_tpu.zk.backend import BulletproofsBackend
        self.backend = backend or BulletproofsBackend()

    def prove(self, program, private_inputs, public_inputs=(),
              constant_inputs=()):
        prog = program.build()
        return self.backend.prove(
            prog, [int(x) for x in private_inputs],
            [int(x) for x in public_inputs],
            [int(x) for x in constant_inputs])

    def verify(self, program, proof, public_inputs=(),
               constant_inputs=()) -> bool:
        prog = program.build()
        return self.backend.verify(
            prog, proof, [int(x) for x in public_inputs],
            [int(x) for x in constant_inputs])

    def proof_builder(self, program):
        """Fluent proving API (reference: `Runtime::proof_builder`,
        `runtime.rs:728-742`)."""
        from sunscreen_tpu.runtime.builders import ProofBuilder
        return ProofBuilder(self, program)

    def verification_builder(self, program):
        """Fluent verification API (reference:
        `Runtime::verification_builder`, `runtime.rs:815-833`)."""
        from sunscreen_tpu.runtime.builders import VerificationBuilder
        return VerificationBuilder(self, program)


class FheZkpRuntime(FheRuntime, ZkpRuntime):
    """Combined runtime (reference: `Runtime::new_fhe_zkp`)."""

    def __init__(self, params: BfvParams, backend=None):
        FheRuntime.__init__(self, params)
        ZkpRuntime.__init__(self, backend)


def Runtime_new_fhe(params: BfvParams) -> FheRuntime:
    return FheRuntime(params)


class Runtime:
    """Namespace mirroring the reference constructor set
    (`Runtime::new_fhe/new_zkp/new_fhe_zkp`, `runtime.rs:829-917`)."""

    new_fhe = staticmethod(Runtime_new_fhe)

    @staticmethod
    def new_zkp(backend=None) -> ZkpRuntime:
        return ZkpRuntime(backend)

    @staticmethod
    def new_fhe_zkp(params: BfvParams, backend=None) -> FheZkpRuntime:
        return FheZkpRuntime(params, backend)
