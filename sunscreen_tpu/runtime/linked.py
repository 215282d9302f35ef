"""Linked proofs: one SDLP + one Bulletproofs R1CS proof constraining
THE SAME message.

Replaces `sunscreen_runtime/src/linked.rs` (`Sdlp`, `LinkedProof`) and
the `LogProofBuilder` fluent API (`src/builder.rs:397-900`:
`encrypt_returning_link`, zkp_program linking, build). The reference
links by sharing Pedersen generators between the SDLP commitment and a
forked bulletproofs; here the link is an explicit generalized-Schnorr
bridge proving that the bits committed in the SDLP's `w_shared` (with
generators h_shared) recompose — under public 2's-complement weights —
to the values inside the Bulletproofs' per-witness Pedersen commitments
V_j. Equivalent guarantee (same message proven valid-encrypted and
constrained by the R1CS), different mechanism; documented delta from
the reference.

Signed messages: digit encodings with digits in {-1, 0, 1} (the
Signed/Unsigned64 fresh encodings, negative values included) link via
centered digit lifts — the field value is sum lift(c_j)*2^j mod L and
the bit weights are the 2's-complement pair [1, -2] per coefficient,
the same recombination the reference's `BfvSigned` ZKP type performs
in-circuit (`types/zkp/bfv_plaintext.rs:64-128`). `reencrypt` and
`decrypt_returning_link` mirror the reference builder's
`reencrypt`/`decrypt_returning_msg` (builder.rs:397-900).
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass, field

import numpy as np

from sunscreen_tpu.logproof import bfv_statement as bstmt
from sunscreen_tpu.logproof import inner_product as lp_ipp
from sunscreen_tpu.logproof import linear_relation as lr
from sunscreen_tpu.logproof.lattice import twos_complement_coeffs
from sunscreen_tpu.zk import curve25519 as cv
from sunscreen_tpu.zk.backend import BulletproofsBackend, \
    BulletproofsProof
from sunscreen_tpu.zk.merlin import Transcript
from sunscreen_tpu.zk.pedersen import cached_pedersen

L = cv.L
SDLP_TRANSCRIPT_LABEL = b"sunscreen_tpu sdlp"


@dataclass
class LinkedMessage:
    """Handle to a message shared between the SDLP and a zkp program
    (reference: `LinkedMessage`, builder.rs:278-293).

    Consumed in one of two link styles, resolved at `build_linked` from
    the zkp program's signature:
    - typed `Linked[BfvSigned...]` args (reference parity): the
      message's SDLP expansion BITS become the program's first private
      inputs and the circuit recombines them (`message_ids` may span
      two polynomials for `BfvRational`);
    - plain `Field` args (compact variant): the recombined field
      `value` is the private input and `weights` recombine
      out-of-circuit inside the bridge.
    """

    message_id: int
    value: int            # field value fed to the zkp program
    weights: list[int]    # bit weights mod L over the message's s_1 bits
    message_ids: tuple[int, ...] = ()   # all polys (Rational: (num, den))
    type_name: str = "Signed"

    def __post_init__(self):
        if not self.message_ids:
            self.message_ids = (self.message_id,)


@dataclass
class Sdlp:
    """A standalone SDLP over BFV statements (reference: `Sdlp`
    struct)."""

    proof: lr.LogProof
    vk: lr.VerifierKnowledge

    def verify(self) -> bool:
        gens = _cached_generators(self.vk.l)
        return lr.verify(self.proof, Transcript(SDLP_TRANSCRIPT_LABEL),
                         self.vk, gens.g, gens.h, lp_ipp.get_u())


@dataclass
class SchnorrBridge:
    """Generalized Schnorr PoK binding w_shared's bits to the BP
    commitments.

    Soundness: the bridge proves knowledge of BOTH an opening of
    w_shared over (h_shared, u) AND an opening of w - w_shared over
    (h_unshared, g, u), under one challenge. Summed, these give an
    opening of the SDLP commitment w over the full independent
    generator set (h, g, u); by Pedersen binding this opening must
    coincide coordinate-wise with the (s_1, s_2, rho) opening the SDLP
    extractor produces, so the bridged exponents over h_shared ARE the
    SDLP's shared s_1 bits. Without the unshared half a prover could
    split w arbitrarily and 'link' an unrelated value (round-1 advisor
    finding). The reference gets the same guarantee by embedding the
    shared generators in the BP's G vector and checking
    A_I1_shared == w_shared (`sunscreen_runtime/src/linked.rs:285`).
    """

    a_h: cv.Point           # commitment over (h_shared, u)
    a_un: cv.Point          # commitment over (h_unshared, g, u)
    a_v: list[cv.Point]     # commitments over (B, B_blinding) per V_j
    z_bits: list[int]
    z_un: list[int]         # responses: h_unshared coords then g coords
    z_rho_h: int
    z_rho_un: int
    z_rho_v: list[int]


@dataclass
class LinkedProof:
    """SDLP + R1CS + bridge (reference: `LinkedProof`,
    linked.rs:32-52). For typed `Linked[...]` programs the bridge binds
    each shared BIT to its own BP input commitment (unit slices with
    weight 1); for plain-Field programs it binds the recombined value
    (the original weighted form)."""

    sdlp: lr.LogProof
    vk: lr.VerifierKnowledge
    shared_slices: list[tuple[int, int]]   # bit ranges per linked input
    weights: list[list[int]]
    bp_proof: BulletproofsProof
    bridge: SchnorrBridge
    params: object = None   # BfvParams when the program has linked args

    def verify(self, zkp_program, public_inputs=(),
               constant_inputs=()) -> bool:
        gens = _cached_generators(self.vk.l)
        u = lp_ipp.get_u()
        # 1. the SDLP
        if not lr.verify(self.sdlp, Transcript(SDLP_TRANSCRIPT_LABEL),
                         self.vk, gens.g, gens.h, u):
            return False
        # 2. the R1CS proof
        backend = BulletproofsBackend()
        if getattr(zkp_program, "linked_types", None):
            if self.params is None:
                return False
            prog = zkp_program.build(params=self.params)
        else:
            prog = zkp_program.build()
        if not backend.verify(prog, self.bp_proof, public_inputs,
                              constant_inputs):
            return False
        # 3. the bridge
        n_linked = len(self.shared_slices)
        if len(self.bp_proof.commitments) < n_linked:
            return False
        vs = self.bp_proof.commitments[:n_linked]
        return _verify_bridge(self.bridge, self.sdlp.w_shared,
                              self.sdlp.w, vs, self.shared_slices,
                              self.weights, gens, u)


_GEN_CACHE: dict[int, lr.LogProofGenerators] = {}


def _cached_generators(l: int) -> lr.LogProofGenerators:
    if l not in _GEN_CACHE:
        _GEN_CACHE[l] = lr.LogProofGenerators(l)
    return _GEN_CACHE[l]


# -- the Schnorr bridge ------------------------------------------------------

def _bridge_transcript(w_shared, w, vs, a_h, a_un, a_v) -> int:
    t = Transcript(b"sunscreen_tpu linked bridge")
    t.append_point(b"w_shared", w_shared)
    t.append_point(b"w", w)
    for v in vs:
        t.append_point(b"V", v)
    t.append_point(b"A_h", a_h)
    t.append_point(b"A_un", a_un)
    for a in a_v:
        t.append_point(b"A_v", a)
    return t.challenge_scalar(b"c")


def _prove_bridge(bits, unshared_exps, rho_h, rho_vs, w_shared, w, vs,
                  slices, weights, gens, u) -> SchnorrBridge:
    """bits: shared s_1 bits. unshared_exps: s_1 at unshared indices
    followed by all of s_2 (the opening of w - w_shared over
    h_unshared + g). rho_h: the blinding on BOTH halves (half_rho)."""
    pc = cached_pedersen()
    n_bits = len(bits)
    y_bits = [secrets.randbelow(L) for _ in range(n_bits)]
    y_un = [secrets.randbelow(L) for _ in unshared_exps]
    y_rho_h = secrets.randbelow(L)
    y_rho_un = secrets.randbelow(L)
    y_rho_v = [secrets.randbelow(L) for _ in vs]
    h_shared, h_unshared = _split_h(gens, slices)
    a_h = cv.msm(y_bits + [y_rho_h], h_shared + [u])
    a_un = cv.msm(y_un + [y_rho_un], h_unshared + list(gens.g) + [u])
    a_v = []
    for j, (lo, hi) in enumerate(slices):
        wsum = sum(w_ * y for w_, y in zip(
            weights[j], y_bits[_offset(slices, j):
                               _offset(slices, j) + hi - lo])) % L
        a_v.append(pc.B * wsum + pc.B_blinding * y_rho_v[j])
    c = _bridge_transcript(w_shared, w, vs, a_h, a_un, a_v)
    z_bits = [(y + c * b) % L for y, b in zip(y_bits, bits)]
    z_un = [(y + c * x) % L for y, x in zip(y_un, unshared_exps)]
    z_rho_h = (y_rho_h + c * rho_h) % L
    z_rho_un = (y_rho_un + c * rho_h) % L
    z_rho_v = [(y + c * r) % L for y, r in zip(y_rho_v, rho_vs)]
    return SchnorrBridge(a_h, a_un, a_v, z_bits, z_un, z_rho_h,
                         z_rho_un, z_rho_v)


def _offset(slices, j) -> int:
    return sum(hi - lo for lo, hi in slices[:j])


def _split_h(gens, slices):
    """(h_shared, h_unshared) — generators inside/outside the shared
    bit ranges, each in ascending index order."""
    shared_idx = set()
    for lo, hi in slices:
        shared_idx.update(range(lo, hi))
    h_shared = []
    for lo, hi in slices:
        h_shared.extend(gens.h[lo:hi])
    h_unshared = [p for i, p in enumerate(gens.h) if i not in shared_idx]
    return h_shared, h_unshared


def _verify_bridge(br: SchnorrBridge, w_shared, w, vs, slices, weights,
                   gens, u) -> bool:
    pc = cached_pedersen()
    h_shared, h_unshared = _split_h(gens, slices)
    if (len(br.z_bits) != len(h_shared)
            or len(br.z_un) != len(h_unshared) + len(gens.g)
            or len(br.z_rho_v) != len(vs)):
        return False
    c = _bridge_transcript(w_shared, w, vs, br.a_h, br.a_un, br.a_v)
    lhs = cv.msm(br.z_bits + [br.z_rho_h], h_shared + [u])
    if lhs != br.a_h + w_shared * c:
        return False
    lhs_un = cv.msm(br.z_un + [br.z_rho_un],
                    h_unshared + list(gens.g) + [u])
    if lhs_un != br.a_un + (w - w_shared) * c:
        return False
    for j, (lo, hi) in enumerate(slices):
        off = _offset(slices, j)
        wsum = sum(w_ * z for w_, z in zip(
            weights[j], br.z_bits[off:off + hi - lo])) % L
        lhs_v = pc.B * wsum + pc.B_blinding * br.z_rho_v[j]
        if lhs_v != br.a_v[j] + vs[j] * c:
            return False
    return True


# -- builder -----------------------------------------------------------------

class LogProofBuilder:
    """Fluent builder (reference: `LogProofBuilder` /
    `LinkedProofBuilder`): encrypt messages while capturing SDLP
    statements, optionally returning links, then build an `Sdlp` or a
    `LinkedProof`."""

    def __init__(self, runtime):
        self.rt = runtime
        self.ctx = runtime.ctx
        self.statements = bstmt.BfvStatements(self.ctx)
        self._links: list[LinkedMessage] = []
        self._msg_bound_bits: dict[int, int] = {}

    # -- encryption capture --------------------------------------------------

    def encrypt(self, value, public_key, seed: int | None = None):
        """Encrypt + record a (non-linked) proof statement."""
        ct, _ = self._encrypt_internal(value, public_key, seed)
        return ct

    def encrypt_returning_link(self, value, public_key,
                               seed: int | None = None):
        """Encrypt + record a statement + return a LinkedMessage for use
        as a zkp program's first private inputs (reference:
        `encrypt_returning_link`, builder.rs:808)."""
        return self._encrypt_internal(value, public_key, seed,
                                      link=True)

    def _encrypt_internal(self, value, public_key, seed, link=False):
        import jax

        from sunscreen_tpu.bfv import ops as bops
        from sunscreen_tpu.math import sampling
        from sunscreen_tpu.runtime.runtime import Ciphertext
        tcls = type(value)
        polys = tcls.encode(value.value, self.ctx.params)
        if polys.ndim == 1:
            polys = polys[None, :]
        key = sampling.key_from_seed(seed)
        cts = []
        mids = []
        for i in range(polys.shape[0]):
            pt = polys[i]
            ct, (u, e0, e1) = bops.encrypt_return_components(
                self.ctx, public_key.public_key, pt,
                jax.random.fold_in(key, i))
            mid = self._add_message(pt)
            self.statements.add_public_encryption(
                mid, np.asarray(ct), public_key.public_key,
                np.asarray(u), np.asarray(e0), np.asarray(e1))
            cts.append(ct)
            mids.append(mid)
        wrapped = Ciphertext(tcls._type_name(), cts, self.ctx.params)
        if not link:
            return wrapped, None
        assert polys.shape[0] in (1, 2), \
            "linked encryption supports 1- or 2-poly types"
        return wrapped, self._link_message(mids, polys,
                                           tcls.__name__)

    def _add_message(self, pt) -> int:
        """Register a message poly; signed ±1 digit encodings (Signed /
        Unsigned / negative values — the reference's `BfvSigned` /
        `BfvUnsigned64` linked types, `types/zkp/bfv_plaintext.rs`) fit
        the 1-magnitude-bit bound (2 bits with the sign bump)."""
        t = self.ctx.params.plain_modulus
        digits = np.asarray(pt, dtype=np.uint64)
        assert np.all((digits <= 1) | (digits == t - 1)), (
            "linked messages must be fresh digit encodings with digits "
            "in {-1, 0, 1} (Signed/Unsigned64 encodings)")
        mid = self.statements.add_message(pt)
        self._msg_bound_bits[mid] = 1
        return mid

    def _link_message(self, mids, polys, type_name="Signed"
                      ) -> LinkedMessage:
        """Field value + bit weights for registered message(s). Value =
        sum_j lift(c_j) * 2^j mod L with centered digit lift (negative
        digits land as L - |v| in the field, matching the reference's
        2's-complement coefficient extraction +  signed recombination,
        `bfv_plaintext.rs:64-128`)."""
        if isinstance(mids, int):
            mids = [mids]
            polys = np.asarray(polys)[None, :]
        t = self.ctx.params.plain_modulus
        val = 0
        for i, c in enumerate(np.asarray(polys[0], dtype=np.uint64)):
            d = int(c)
            if d > t // 2:
                d -= t
            val = (val + d * (1 << i)) % L
        tc = twos_complement_coeffs(2)  # 1-bit bound -> 2 bits signed
        weights = []
        for j in range(self.ctx.n):
            for w in tc:
                weights.append((1 << j) * w % L)
        msg = LinkedMessage(mids[0], val, weights,
                            message_ids=tuple(mids),
                            type_name=type_name)
        self._links.append(msg)
        return msg

    # -- decryption / reencryption capture ----------------------------------

    def decrypt_returning_link(self, ct, private_key):
        """Decrypt + record a Decryption statement + return a
        LinkedMessage for the decrypted value (reference:
        `decrypt_returning_msg`, builder.rs:397-900)."""
        from sunscreen_tpu.bfv import ops as bops
        from sunscreen_tpu.types.bfv_types import resolve_type
        assert len(ct.cts) == 1, "single-ciphertext types only"
        raw = ct.cts[0]
        pt = np.asarray(bops.decrypt(self.ctx, private_key.sk, raw))
        mid = self._add_message(pt)
        self.statements.add_decryption(mid, np.asarray(raw),
                                       private_key.sk)
        value = resolve_type(ct.type_name).decode(pt, self.ctx.params)
        return value, self._link_message(mid, pt)

    def reencrypt(self, ct, private_key, public_key,
                  seed: int | None = None, link: bool = True):
        """Prove `new_ct` encrypts THE SAME message `ct` decrypts to:
        records one shared message with both a Decryption statement (old
        ct) and a PublicKeyEncryption statement (new ct) against it
        (reference: `LogProofBuilder::reencrypt`, builder.rs:397-900).
        Returns (new_ct, LinkedMessage | None)."""
        from sunscreen_tpu.bfv import ops as bops
        from sunscreen_tpu.math import sampling
        from sunscreen_tpu.runtime.runtime import Ciphertext
        assert len(ct.cts) == 1, "single-ciphertext types only"
        raw = ct.cts[0]
        pt = np.asarray(bops.decrypt(self.ctx, private_key.sk, raw))
        mid = self._add_message(pt)
        self.statements.add_decryption(mid, np.asarray(raw),
                                       private_key.sk)
        key = sampling.key_from_seed(seed)
        new_raw, (u, e0, e1) = bops.encrypt_return_components(
            self.ctx, public_key.public_key, pt, key)
        self.statements.add_public_encryption(
            mid, np.asarray(new_raw), public_key.public_key,
            np.asarray(u), np.asarray(e0), np.asarray(e1))
        wrapped = Ciphertext(ct.type_name, [new_raw], self.ctx.params)
        if not link:
            return wrapped, None
        return wrapped, self._link_message(mid, pt)

    # -- builds --------------------------------------------------------------

    def _prover_knowledge(self):
        return self.statements.build(message_bound_bits=1)

    def build_sdlp(self) -> Sdlp:
        vk, pk_know = self._prover_knowledge()
        gens = _cached_generators(vk.l)
        proof = lr.create(Transcript(SDLP_TRANSCRIPT_LABEL), pk_know,
                          gens.g, gens.h, lp_ipp.get_u())
        return Sdlp(proof, vk)

    def build_linked(self, zkp_program, extra_private_inputs=(),
                     public_inputs=(), constant_inputs=()
                     ) -> LinkedProof:
        """SDLP with shared message bits + BP proof whose first private
        inputs are the linked messages + bridge (reference:
        `LinkedProofBuilder::build`, builder.rs:445). Typed
        `Linked[BfvSigned...]` programs take the raw expansion bits
        in-circuit; plain-Field programs take the recombined value."""
        if getattr(zkp_program, "linked_types", None):
            return self._build_linked_circuit(
                zkp_program, extra_private_inputs, public_inputs,
                constant_inputs)
        vk, pk_know = self._prover_knowledge()
        gens = _cached_generators(vk.l)
        u = lp_ipp.get_u()
        half_rho = secrets.randbelow(L)
        shared_cols = [(m.message_id, 0) for m in self._links]
        sdlp_proof = lr.create(
            Transcript(SDLP_TRANSCRIPT_LABEL), pk_know, gens.g, gens.h,
            u, half_rho=half_rho, shared_indices=shared_cols)
        slices = [vk.b_slices()[m.message_id][0] for m in self._links]

        # R1CS proof with the linked values first
        backend = BulletproofsBackend()
        prog = zkp_program.build()
        private = [m.value for m in self._links] \
            + [int(x) for x in extra_private_inputs]
        bp_proof, blindings = backend.prove_with_blindings(
            prog, private, [int(x) for x in public_inputs],
            [int(x) for x in constant_inputs])

        # bridge
        s_1 = lr._binary_expand(vk, pk_know.s)
        s_2 = [1 - b for b in s_1]
        shared_idx = set()
        for lo, hi in slices:
            shared_idx.update(range(lo, hi))
        bits = []
        for lo, hi in slices:
            bits.extend(s_1[lo:hi])
        unshared_exps = [s_1[i] for i in range(vk.l)
                         if i not in shared_idx] + s_2
        weights = [m.weights[:hi - lo]
                   for m, (lo, hi) in zip(self._links, slices)]
        vs = bp_proof.commitments[:len(self._links)]
        bridge = _prove_bridge(bits, unshared_exps, half_rho, blindings,
                               sdlp_proof.w_shared, sdlp_proof.w, vs,
                               slices, weights, gens, u)
        return LinkedProof(sdlp_proof, vk, slices, weights, bp_proof,
                           bridge)

    def _build_linked_circuit(self, zkp_program, extra_private_inputs,
                              public_inputs, constant_inputs
                              ) -> LinkedProof:
        """Typed in-circuit links: raise the linked message columns to
        full plaintext bounds with the type's degree bound, share their
        complete bit expansions, feed the bits as the BP's first
        private inputs, and bridge EACH bit to its own input commitment
        (reference surface: `#[linked] x: BfvSigned`,
        `types/zkp/bfv_plaintext.rs` + `builder.rs:947-951`; mechanism
        delta: per-bit Schnorr bridge instead of shared-generator
        A_I1 == w_shared, see module docstring)."""
        params = self.ctx.params
        t = params.plain_modulus
        linked_types = zkp_program.linked_types
        if len(linked_types) != len(self._links):
            raise ValueError(
                f"program has {len(linked_types)} linked args but "
                f"{len(self._links)} links were returned by the builder")
        compat = {"BfvSigned": ("Signed",),
                  "BfvUnsigned64": ("Unsigned64", "Unsigned"),
                  "BfvUnsigned128": ("Unsigned128",),
                  "BfvRational": ("Rational",)}
        bound = max(1, (t - 1).bit_length())
        for ltype, link in zip(linked_types, self._links):
            names = compat.get(ltype.__name__)
            if names and not any(link.type_name.startswith(nm)
                                 for nm in names):
                raise TypeError(
                    f"linked arg expects {ltype.__name__} but the "
                    f"builder linked a {link.type_name}")
            if ltype.N_POLYS != len(link.message_ids):
                raise TypeError(
                    f"{ltype.__name__} spans {ltype.N_POLYS} "
                    f"polynomials; link has {len(link.message_ids)}")
            d_bound = min(ltype.DEGREE_BOUND, params.poly_degree)
            for mid in link.message_ids:
                self.statements.message_bounds[mid] = (bound, d_bound)

        vk, pk_know = self._prover_knowledge()
        gens = _cached_generators(vk.l)
        u = lp_ipp.get_u()
        half_rho = secrets.randbelow(L)
        shared_cols = [(mid, 0) for m in self._links
                       for mid in m.message_ids]
        sdlp_proof = lr.create(
            Transcript(SDLP_TRANSCRIPT_LABEL), pk_know, gens.g, gens.h,
            u, half_rho=half_rho, shared_indices=shared_cols)
        all_slices = vk.b_slices()
        msg_slices = [all_slices[mid][0] for m in self._links
                      for mid in m.message_ids]

        # the shared bits, in slice order (coeff-major, LSB-first —
        # the same layout _LinkedTypeMeta.make_node nests)
        s_1 = lr._binary_expand(vk, pk_know.s)
        bits = []
        bit_slices = []
        for lo, hi in msg_slices:
            bits.extend(s_1[lo:hi])
            bit_slices.extend((p, p + 1) for p in range(lo, hi))
        bit_weights = [[1]] * len(bits)

        backend = BulletproofsBackend()
        prog = zkp_program.build(params=params)
        private = bits + [int(x) for x in extra_private_inputs]
        bp_proof, blindings = backend.prove_with_blindings(
            prog, private, [int(x) for x in public_inputs],
            [int(x) for x in constant_inputs])

        shared_idx = set()
        for lo, hi in msg_slices:
            shared_idx.update(range(lo, hi))
        unshared_exps = [s_1[i] for i in range(vk.l)
                         if i not in shared_idx] \
            + [1 - b for b in s_1]
        vs = bp_proof.commitments[:len(bits)]
        bridge = _prove_bridge(bits, unshared_exps, half_rho,
                               blindings[:len(bits)],
                               sdlp_proof.w_shared, sdlp_proof.w, vs,
                               bit_slices, bit_weights, gens, u)
        return LinkedProof(sdlp_proof, vk, bit_slices, bit_weights,
                           bp_proof, bridge, params=params)
