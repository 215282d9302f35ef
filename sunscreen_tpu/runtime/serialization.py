"""Serialization with embedded parameters.

Replaces `sunscreen_runtime/src/serialization.rs:16-100` (`WithContext<T>`
pairs every SEAL object with its `Params` so deserialization can rebuild
the context and validate compatibility) and the serde surface of keys /
ciphertexts / compiled programs.

Format: npz archive with a JSON params/metadata header — portable,
no pickling.
"""

from __future__ import annotations

import io
import json

import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.bfv import get_context
from sunscreen_tpu.bfv import keys as bkeys
from sunscreen_tpu.bfv.params import BfvParams
from sunscreen_tpu.runtime.runtime import Ciphertext, PrivateKey, \
    PublicKeySet


def params_to_dict(p: BfvParams) -> dict:
    return {
        "poly_degree": p.poly_degree,
        "plain_modulus": p.plain_modulus,
        "coeff_modulus": list(p.coeff_modulus),
        "special_modulus": p.special_modulus,
        "security_level": p.security_level,
        "scheme": "bfv",
    }


def params_from_dict(d: dict) -> BfvParams:
    assert d.get("scheme", "bfv") == "bfv"
    return BfvParams(d["poly_degree"], d["plain_modulus"],
                     tuple(d["coeff_modulus"]), d["special_modulus"],
                     d["security_level"])


def _pack(meta: dict, arrays: dict[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez_compressed(
        buf, __meta__=np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8), **arrays)
    return buf.getvalue()


def _unpack(data: bytes) -> tuple[dict, dict]:
    with np.load(io.BytesIO(data)) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    return meta, arrays


class ParamsMismatch(Exception):
    """Deserialized object's params differ from the target runtime's."""


def check_params(meta: dict, expect: BfvParams | None):
    got = params_from_dict(meta["params"])
    if expect is not None and got != expect:
        raise ParamsMismatch(f"expected {expect}, got {got}")
    return got


# -- ciphertexts -------------------------------------------------------------

def ciphertext_to_bytes(ct: Ciphertext) -> bytes:
    meta = {"kind": "ciphertext", "type_name": ct.type_name,
            "params": params_to_dict(ct.params),
            "n": len(ct.cts)}
    arrays = {f"ct{i}": np.asarray(c) for i, c in enumerate(ct.cts)}
    return _pack(meta, arrays)


def ciphertext_from_bytes(data: bytes,
                          expect_params: BfvParams | None = None
                          ) -> Ciphertext:
    meta, arrays = _unpack(data)
    assert meta["kind"] == "ciphertext"
    params = check_params(meta, expect_params)
    cts = [jnp.asarray(arrays[f"ct{i}"]) for i in range(meta["n"])]
    return Ciphertext(meta["type_name"], cts, params)


# -- keys --------------------------------------------------------------------

def public_keys_to_bytes(pks: PublicKeySet, params: BfvParams) -> bytes:
    meta = {"kind": "public_keys", "params": params_to_dict(params),
            "has_relin": pks.relin_key is not None,
            "galois_elements": sorted(pks.galois_keys.keys)
            if pks.galois_keys else []}
    arrays = {"p0": np.asarray(pks.public_key.p0),
              "p1": np.asarray(pks.public_key.p1)}
    if pks.relin_key is not None:
        arrays["rlk0"] = np.asarray(pks.relin_key.k0)
        arrays["rlk1"] = np.asarray(pks.relin_key.k1)
    if pks.galois_keys:
        for g, kk in pks.galois_keys.keys.items():
            arrays[f"gk{g}_0"] = np.asarray(kk.k0)
            arrays[f"gk{g}_1"] = np.asarray(kk.k1)
    return _pack(meta, arrays)


def public_keys_from_bytes(data: bytes,
                           expect_params: BfvParams | None = None
                           ) -> tuple[PublicKeySet, BfvParams]:
    meta, arrays = _unpack(data)
    assert meta["kind"] == "public_keys"
    params = check_params(meta, expect_params)
    pk = bkeys.PublicKey(jnp.asarray(arrays["p0"]),
                         jnp.asarray(arrays["p1"]))
    rlk = None
    if meta["has_relin"]:
        rlk = bkeys.KswKey(jnp.asarray(arrays["rlk0"]),
                           jnp.asarray(arrays["rlk1"]))
    gks = None
    if meta["galois_elements"]:
        gks = bkeys.GaloisKeys({
            g: bkeys.KswKey(jnp.asarray(arrays[f"gk{g}_0"]),
                            jnp.asarray(arrays[f"gk{g}_1"]))
            for g in meta["galois_elements"]})
    return PublicKeySet(pk, rlk, gks), params


def private_key_to_bytes(priv: PrivateKey, params: BfvParams) -> bytes:
    meta = {"kind": "private_key", "params": params_to_dict(params)}
    return _pack(meta, {"s": np.asarray(priv.sk.s)})


def private_key_from_bytes(data: bytes,
                           expect_params: BfvParams | None = None
                           ) -> tuple[PrivateKey, BfvParams]:
    meta, arrays = _unpack(data)
    assert meta["kind"] == "private_key"
    params = check_params(meta, expect_params)
    ctx = get_context(params)
    from sunscreen_tpu.math import sampling
    s = jnp.asarray(arrays["s"])
    s_q = sampling.signed_to_rns(s, ctx.q_base.q_dev)
    s_key = sampling.signed_to_rns(s, ctx.key_base.q_dev)
    sk = bkeys.SecretKey(s, ctx.plan_q.fwd(s_q), ctx.plan_key.fwd(s_key))
    return PrivateKey(sk), params


# -- compiled programs -------------------------------------------------------

def program_to_bytes(prog) -> bytes:
    from sunscreen_tpu.compiler.compiler import CompiledFheProgram
    assert isinstance(prog, CompiledFheProgram)
    meta = {"kind": "fhe_program", "name": prog.name,
            "params": params_to_dict(prog.params),
            "ir": json.loads(prog.prog.to_json()),
            "signature": {
                "arg_types": prog.signature.arg_types,
                "ret_types": prog.signature.ret_types,
                "num_ciphertexts": prog.signature.num_ciphertexts,
            }}
    arrays = {f"lit{i}": lit for i, lit in enumerate(prog.literals)}
    return _pack(meta, arrays)


def program_from_bytes(data: bytes):
    from sunscreen_tpu.compiler.compiler import CompiledFheProgram
    from sunscreen_tpu.compiler.ir import FheProgram
    from sunscreen_tpu.compiler.trace import CallSignature
    meta, arrays = _unpack(data)
    assert meta["kind"] == "fhe_program"
    params = params_from_dict(meta["params"])
    ir = FheProgram.from_json(json.dumps(meta["ir"]))
    sig = meta["signature"]
    signature = CallSignature(
        [tuple(x) for x in sig["arg_types"]],
        [tuple(x) for x in sig["ret_types"]],
        list(sig["num_ciphertexts"]))
    lits = [arrays[f"lit{i}"] for i in range(len(arrays))]
    return CompiledFheProgram(meta["name"], ir, signature, lits, params)
