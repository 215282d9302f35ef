"""Compiler + runtime end-to-end: the reference's integration-test
surface (`sunscreen/tests/{signed,fractional,rational,simd}.rs` and
`examples/simple_multiply`)."""

import numpy as np
import pytest

from sunscreen_tpu.bfv import BfvParams
from sunscreen_tpu.compiler import Compiler, Op, fhe_program
from sunscreen_tpu.runtime import Runtime, TooMuchNoise
from sunscreen_tpu.types import (Batched, Cipher, Fractional, Rational,
                                 Signed, Unsigned64)

PARAMS = BfvParams.insecure(poly_degree=1024, limbs=2, limb_bits=40)


@fhe_program(scheme="bfv")
def simple_multiply(a: Cipher[Signed], b: Cipher[Signed]):
    return a * b


@pytest.fixture(scope="module")
def rt_keys():
    rt = Runtime.new_fhe(PARAMS)
    pub, priv = rt.generate_keys(seed=1, galois=True)
    return rt, pub, priv


def compile_with_params(*progs):
    c = Compiler().with_params(PARAMS)
    for p in progs:
        c = c.fhe_program(p)
    return c.compile()


def test_simple_multiply(rt_keys):
    # reference: examples/simple_multiply
    rt, pub, priv = rt_keys
    app = compile_with_params(simple_multiply)
    prog = app.get_program(simple_multiply)
    assert prog.requires_relin_keys  # relin inserted after the multiply
    a = rt.encrypt(Signed(15), pub, seed=2)
    b = rt.encrypt(Signed(-5), pub, seed=3)
    (out,) = rt.run(prog, [a, b], pub)
    assert rt.decrypt(out, priv) == -75


def test_relin_insertion_graph_shape():
    # reference: insert_relinearizations.rs:82-141 unit test
    app = compile_with_params(simple_multiply)
    prog = app.get_program(simple_multiply).prog
    assert prog.count(Op.MULTIPLY) == 1
    assert prog.count(Op.RELINEARIZE) == 1
    muls = [i for i, n in enumerate(prog.nodes) if n.op == Op.MULTIPLY]
    relins = [i for i, n in enumerate(prog.nodes)
              if n.op == Op.RELINEARIZE]
    assert prog.nodes[relins[0]].operands == (muls[0],)


def test_literals_and_mixed_ops(rt_keys):
    rt, pub, priv = rt_keys

    @fhe_program(scheme="bfv")
    def affine(x: Cipher[Signed]):
        return 3 * x + 7 - Signed_lit()

    def Signed_lit():
        return 2

    app = compile_with_params(affine)
    x = rt.encrypt(Signed(10), pub, seed=4)
    (out,) = rt.run(app.get_program(affine), [x], pub)
    assert rt.decrypt(out, priv) == 3 * 10 + 7 - 2


def test_unsigned(rt_keys):
    rt, pub, priv = rt_keys

    @fhe_program(scheme="bfv")
    def umul(a: Cipher[Unsigned64], b: Cipher[Unsigned64]):
        return a * b

    app = compile_with_params(umul)
    a = rt.encrypt(Unsigned64(123), pub, seed=5)
    b = rt.encrypt(Unsigned64(456), pub, seed=6)
    (out,) = rt.run(app.get_program(umul), [a, b], pub)
    assert rt.decrypt(out, priv) == 123 * 456


def test_fractional(rt_keys):
    rt, pub, priv = rt_keys

    @fhe_program(scheme="bfv")
    def fma(a: Cipher[Fractional[16]], b: Cipher[Fractional[16]]):
        return a * b + 0.5

    app = compile_with_params(fma)
    a = rt.encrypt(Fractional[16](3.25), pub, seed=7)
    b = rt.encrypt(Fractional[16](-2.5), pub, seed=8)
    (out,) = rt.run(app.get_program(fma), [a, b], pub)
    assert rt.decrypt(out, priv) == pytest.approx(3.25 * -2.5 + 0.5)


def test_rational_division(rt_keys):
    rt, pub, priv = rt_keys

    @fhe_program(scheme="bfv")
    def ratio(a: Cipher[Rational], b: Cipher[Rational]):
        return (a / b) + a * 2

    app = compile_with_params(ratio)
    a = rt.encrypt(Rational(3, 4), pub, seed=9)
    b = rt.encrypt(Rational(1, 2), pub, seed=10)
    (out,) = rt.run(app.get_program(ratio), [a, b], pub)
    got = rt.decrypt(out, priv)
    assert float(got) == pytest.approx(3 / 4 / (1 / 2) + 2 * 3 / 4)


def test_batched_rotations(rt_keys):
    # reference: sunscreen/tests/simd.rs
    rt, pub, priv = rt_keys

    @fhe_program(scheme="bfv")
    def rot(x: Cipher[Batched]):
        return (x << 2) + x.swap_rows()

    app = compile_with_params(rot)
    prog = app.get_program(rot)
    assert prog.requires_galois_keys
    n = PARAMS.poly_degree
    v = np.arange(n, dtype=np.int64) % 97
    ct = rt.encrypt(Batched(v), pub, seed=11)
    (out,) = rt.run(prog, [ct], pub)
    got = rt.decrypt(out, priv)
    half = n // 2
    rows = v.reshape(2, half)
    expect = (np.concatenate([np.roll(rows[0], -2), np.roll(rows[1], -2)])
              + np.concatenate([rows[1], rows[0]]))
    np.testing.assert_array_equal(got, expect)


def test_multi_program_shared_params(rt_keys):
    # reference: sunscreen/tests/multi_program.rs
    rt, pub, priv = rt_keys

    @fhe_program(scheme="bfv")
    def add2(a: Cipher[Signed], b: Cipher[Signed]):
        return a + b

    @fhe_program(scheme="bfv")
    def mul2(a: Cipher[Signed], b: Cipher[Signed]):
        return a * b

    app = compile_with_params(add2, mul2)
    assert set(app.programs) == {"add2", "mul2"}
    a = rt.encrypt(Signed(20), pub, seed=12)
    b = rt.encrypt(Signed(22), pub, seed=13)
    (s,) = rt.run(app.get_program(add2), [a, b], pub)
    (p,) = rt.run(app.get_program(mul2), [a, b], pub)
    assert rt.decrypt(s, priv) == 42
    assert rt.decrypt(p, priv) == 440


def test_multiple_outputs(rt_keys):
    rt, pub, priv = rt_keys

    @fhe_program(scheme="bfv")
    def two(a: Cipher[Signed], b: Cipher[Signed]):
        return a + b, a - b

    app = compile_with_params(two)
    a = rt.encrypt(Signed(9), pub, seed=14)
    b = rt.encrypt(Signed(4), pub, seed=15)
    s, d = rt.run(app.get_program(two), [a, b], pub)
    assert rt.decrypt(s, priv) == 13
    assert rt.decrypt(d, priv) == 5


def test_param_search_smoke():
    # analytic search (reference: ParamsMode::Search) — no execution
    c = Compiler().fhe_program(simple_multiply)
    params = c._search_params()
    assert params.poly_degree >= 4096
    from sunscreen_tpu.compiler.passes import compile_program
    prog, _, _ = simple_multiply.build(params)
    from sunscreen_tpu.compiler.noise import predicted_budget
    assert predicted_budget(compile_program(prog), params) >= 20


def test_measured_search_default_on(monkeypatch):
    """Round-5 reference parity: with no explicit opt-out the search
    confirms parameters with the MeasuredModel (the reference runs its
    measured model unconditionally, params.rs:199-226). conftest sets
    SUNSCREEN_TPU_MEASURED_SEARCH=0 for suite time — clear it here."""
    monkeypatch.delenv("SUNSCREEN_TPU_MEASURED_SEARCH", raising=False)
    assert Compiler()._measured_model
    monkeypatch.setenv("SUNSCREEN_TPU_MEASURED_SEARCH", "0")
    assert not Compiler()._measured_model
    # opt-out API still works against the on-default
    monkeypatch.delenv("SUNSCREEN_TPU_MEASURED_SEARCH", raising=False)
    assert not Compiler().use_measured_noise_model(
        False)._measured_model


def test_measured_search_end_to_end():
    """The measured-confirm search returns params the measured model
    itself accepts (and that run correctly end-to-end)."""
    c = (Compiler().fhe_program(simple_multiply)
         .use_measured_noise_model(True))
    params = c._search_params()
    assert params.poly_degree >= 4096
    from sunscreen_tpu.compiler.noise import MeasuredModel
    from sunscreen_tpu.compiler.compiler import CompiledFheProgram
    from sunscreen_tpu.compiler.passes import compile_program
    prog, sig, lits = simple_multiply.build(params)
    compiled = CompiledFheProgram(simple_multiply.name,
                                  compile_program(prog), sig, lits,
                                  params)
    assert MeasuredModel(compiled, params).worst_budget \
        >= c._noise_margin


def test_signature_validation(rt_keys):
    rt, pub, priv = rt_keys
    app = compile_with_params(simple_multiply)
    prog = app.get_program(simple_multiply)
    a = rt.encrypt(Signed(1), pub, seed=16)
    u = rt.encrypt(Unsigned64(1), pub, seed=17)
    with pytest.raises(Exception):
        rt.run(prog, [a], pub)        # wrong arity
    with pytest.raises(Exception):
        rt.run(prog, [a, u], pub)     # wrong type


def test_ir_serialization_roundtrip():
    from sunscreen_tpu.compiler.ir import FheProgram
    app = compile_with_params(simple_multiply)
    prog = app.get_program(simple_multiply).prog
    rt = FheProgram.from_json(prog.to_json())
    assert [n.op for n in rt.nodes] == [n.op for n in prog.nodes]
    assert rt.outputs == prog.outputs


def test_measured_noise_model():
    # reference: MeasuredModel actually encrypts + runs the program
    from sunscreen_tpu.compiler.noise import MeasuredModel, \
        predicted_budget
    app = compile_with_params(simple_multiply)
    prog = app.get_program(simple_multiply)
    model = MeasuredModel(prog, PARAMS)
    assert model.worst_budget > 0
    # analytic prediction must be conservative vs measurement
    assert predicted_budget(prog.prog, PARAMS) <= model.worst_budget + 1


def test_generic_unsigned_limbs():
    """Unsigned[LIMBS] generic (reference: `Unsigned<LIMBS>`,
    `types/bfv/unsigned.rs:33`): Unsigned128 arithmetic end-to-end."""
    import numpy as np

    from sunscreen_tpu.bfv import BfvParams
    from sunscreen_tpu.runtime import Runtime
    from sunscreen_tpu.types import Unsigned128, Unsigned

    assert Unsigned128 is Unsigned[2]
    assert Unsigned128._type_name() == "Unsigned<2>"
    params = BfvParams.insecure(poly_degree=256, limbs=2)
    rt = Runtime.new_fhe(params)
    pub, priv = rt.generate_keys(seed=9, galois=False, relin=False)
    big = (1 << 90) + 12345
    ct = rt.encrypt(Unsigned128(big), pub, seed=10)
    assert rt.decrypt(ct, priv) == big
    # wrap semantics at the type's width
    assert Unsigned[2](1 << 128).value == 0


def test_array_program_inputs():
    """Fixed-size array args (reference: `sunscreen/tests/array.rs`)."""
    from sunscreen_tpu.bfv import BfvParams
    from sunscreen_tpu.compiler import fhe_program
    from sunscreen_tpu.runtime import Runtime
    from sunscreen_tpu.types import Array, Cipher, Signed

    @fhe_program(scheme="bfv")
    def dot4(xs: Array[Cipher[Signed], 4], w: Cipher[Signed]):
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        return acc * w

    from sunscreen_tpu.compiler import Compiler
    params = BfvParams.insecure(poly_degree=256, limbs=2)
    app = Compiler().fhe_program(dot4).with_params(params).compile()
    rt = Runtime.new_fhe(params)
    pub, priv = rt.generate_keys(seed=21, galois=False)
    xs = [rt.encrypt(Signed(v), pub, seed=30 + i)
          for i, v in enumerate((1, 2, 3, 4))]
    w = rt.encrypt(Signed(5), pub, seed=40)
    out = rt.run(app.get_program("dot4"), [xs, w], pub)
    assert rt.decrypt(out[0], priv) == (1 + 2 + 3 + 4) * 5


def test_fractional_const_division(rt_keys):
    """cipher / constant (reference: `GraphCipherConstDiv for
    Fractional`, `sunscreen/src/types/bfv/fractional.rs:400-420`)."""
    rt, pub, priv = rt_keys

    @fhe_program(scheme="bfv")
    def halve(a: Cipher[Fractional[16]]):
        return a / 2.0 + a / 0.25

    app = compile_with_params(halve)
    a = rt.encrypt(Fractional[16](6.5), pub, seed=50)
    (out,) = rt.run(app.get_program(halve), [a], pub)
    assert rt.decrypt(out, priv) == pytest.approx(6.5 / 2.0 + 6.5 / 0.25)
    # cipher / cipher stays a type error (reference has no such op)
    with pytest.raises(TypeError):
        @fhe_program(scheme="bfv")
        def bad(a: Cipher[Fractional[16]], b: Cipher[Fractional[16]]):
            return a / b
        compile_with_params(bad)


def test_fhe_program_fn_compile_kwargs():
    """FheProgramFnExt parity: `prog.compile(...)` forwards to the
    builder (`sunscreen/src/compiler.rs:90-136`)."""
    app = simple_multiply.compile(params=PARAMS)
    assert app.params is PARAMS
    assert app.get_program("simple_multiply").requires_relin_keys


def test_zkp_program_through_compiler():
    """FHE + ZKP programs through ONE builder (reference:
    `Compiler::zkp_backend::<B>().zkp_program(f)`,
    `sunscreen/src/compiler.rs:304,360-457`)."""
    from sunscreen_tpu.runtime import ZkpRuntime
    from sunscreen_tpu.types.zkp_types import Field, zkp_program

    @zkp_program()
    def is_product(a: Field, b: Field, c: Field):
        (a * b).constrain_eq(c)

    app = (Compiler()
           .fhe_program(simple_multiply)
           .zkp_backend()
           .zkp_program(is_product)
           .with_params(PARAMS)
           .compile())
    assert "simple_multiply" in app.programs
    zp = app.get_zkp_program(is_product)
    rt = ZkpRuntime()
    proof = rt.prove(zp, [3, 5, 15])
    assert rt.verify(zp, proof)
    # zkp-only application needs no FHE params
    app2 = Compiler().zkp_backend().zkp_program(is_product).compile()
    assert app2.params is None and "is_product" in app2.zkp_programs


def test_typed_errors():
    """Library paths raise typed errors, not AssertionError (reference:
    per-crate error enums, e.g. `sunscreen_runtime/src/error.rs`)."""
    import jax.numpy as jnp

    from sunscreen_tpu.bfv import get_context, ops
    from sunscreen_tpu.errors import (InvalidArgument, ParamsError,
                                      SunscreenError)

    with pytest.raises(ParamsError):
        BfvParams(1000, 17, (1 << 40,), 1 << 40, 0)  # non-power-of-two N
    with pytest.raises(ParamsError):
        BfvParams.default(4096, plain_modulus=1 << 60)  # t >= q_i
    ctx = get_context(PARAMS)
    with pytest.raises(InvalidArgument):
        ops.relinearize(ctx, jnp.zeros((2, ctx.k, ctx.n), jnp.uint64), None)
    with pytest.raises(SunscreenError):
        ops.add_many(ctx, [])


def test_add_many_multiply_many(rt_keys):
    """Evaluator conveniences (SEAL binding surface:
    `seal_fhe/src/evaluator.rs:38-52`)."""
    from sunscreen_tpu.bfv import get_context, keys as bkeys, ops
    import jax

    # depth-3 multiply tree needs more noise budget than PARAMS gives
    ctx = get_context(BfvParams.insecure(1024, limbs=3, limb_bits=50))
    key = jax.random.key(99)
    sk = bkeys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
    pk = bkeys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
    rlk = bkeys.gen_relin_key(ctx, sk, jax.random.fold_in(key, 2))
    import jax.numpy as jnp
    vals = (3, 5, 7, 11, 2)
    cts = [ops.encrypt(ctx, pk,
                       jnp.zeros(ctx.n, jnp.uint64).at[0].set(v),
                       jax.random.fold_in(key, 10 + i))
           for i, v in enumerate(vals)]
    s = ops.decrypt(ctx, sk, ops.add_many(ctx, cts))
    assert int(s[0]) == sum(vals) % ctx.t
    p = ops.decrypt(ctx, sk, ops.multiply_many(ctx, cts, rlk))
    prod = 1
    for v in vals:
        prod = prod * v % ctx.t
    assert int(p[0]) == prod


def test_run_with_multiple_key_sets():
    """One compiled program, several key sets: the lowered executor
    must take the evaluation keys as arguments, not bake the first
    caller's keys into the jit (round-4 regression: the second key
    set silently ran with the first's relin keys and decrypted to
    noise — the multi-tenant serving hazard)."""
    from sunscreen_tpu.compiler import Compiler, PlainModulusConstraint, \
        fhe_program
    from sunscreen_tpu.runtime import Runtime
    from sunscreen_tpu.types import Cipher, Signed

    @fhe_program(scheme="bfv")
    def sq(a: Cipher[Signed]):
        return a * a

    app = (Compiler().fhe_program(sq)
           .plain_modulus_constraint(PlainModulusConstraint.Raw(64))
           .compile())
    rt = Runtime.new_fhe(app.params)
    prog = app.get_program(sq)
    for seed, val in ((1, 5), (11, 7), (None, 6)):
        pub, priv = rt.generate_keys(galois=False, seed=seed)
        ct = rt.encrypt(Signed(val), pub, seed=3)
        (out,) = rt.run(prog, [ct], pub)
        assert rt.decrypt(out, priv) == val * val, f"key set seed={seed}"


def test_compiler_engine_selection():
    """`.engine('u32')` searches the u32 modulus chain (every prime
    < 2^30 — the TPU production word); 'auto' picks u64 on CPU hosts.
    Both compile and roundtrip the same program."""
    from sunscreen_tpu.compiler import Compiler, PlainModulusConstraint, \
        fhe_program
    from sunscreen_tpu.runtime import Runtime
    from sunscreen_tpu.types import Cipher, Signed

    @fhe_program(scheme="bfv")
    def sq32(a: Cipher[Signed]):
        return a * a

    app32 = (Compiler().fhe_program(sq32).engine("u32")
             .plain_modulus_constraint(PlainModulusConstraint.Raw(64))
             .compile())
    assert all(q < 1 << 30 for q in app32.params.coeff_modulus)
    assert app32.params.special_modulus < 1 << 30
    rt = Runtime.new_fhe(app32.params)
    pub, priv = rt.generate_keys(galois=False, seed=2)
    ct = rt.encrypt(Signed(9), pub, seed=4)
    (out,) = rt.run(app32.get_program(sq32), [ct], pub)
    assert rt.decrypt(out, priv) == 81
    # auto on this CPU test host = u64 chain
    app_auto = (Compiler().fhe_program(sq32)
                .plain_modulus_constraint(PlainModulusConstraint.Raw(64))
                .compile())
    assert any(q >= 1 << 30 for q in app_auto.params.coeff_modulus)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        Compiler().engine("u128")


def test_decrypt_many_matches_decrypt():
    """decrypt_many = one jitted call + one fetch for several outputs
    (the tunnel-RTT batching path); results and the noise guard match
    per-ct decrypt."""
    from sunscreen_tpu.compiler import Compiler, PlainModulusConstraint, \
        fhe_program
    from sunscreen_tpu.runtime import Runtime
    from sunscreen_tpu.types import Cipher, Signed

    @fhe_program(scheme="bfv")
    def two(a: Cipher[Signed], b: Cipher[Signed]):
        return a * b, a + b

    app = (Compiler().fhe_program(two)
           .plain_modulus_constraint(PlainModulusConstraint.Raw(64))
           .compile())
    rt = Runtime.new_fhe(app.params)
    pub, priv = rt.generate_keys(galois=False, seed=7)
    x = rt.encrypt(Signed(6), pub, seed=1)
    y = rt.encrypt(Signed(-4), pub, seed=2)
    outs = rt.run(app.get_program(two), [x, y], pub)
    many = rt.decrypt_many(outs, priv)
    single = [rt.decrypt(o, priv) for o in outs]
    assert many == single == [-24, 2]
    assert rt.decrypt_many([], priv) == []


def test_run_with_multiple_key_sets_galois():
    """The keys-as-arguments executor with GALOIS keys: a rotation
    program under two different key sets (the relin-only regression
    test doesn't exercise the galois leaves)."""
    import numpy as np

    from sunscreen_tpu.bfv import BfvParams
    from sunscreen_tpu.compiler import Compiler, fhe_program
    from sunscreen_tpu.runtime import Runtime
    from sunscreen_tpu.types import Batched, Cipher

    @fhe_program(scheme="bfv")
    def rot(a: Cipher[Batched]):
        return (a << 2) + a

    params = BfvParams.insecure(poly_degree=32, limbs=2, limb_bits=40)
    app = Compiler().with_params(params).fhe_program(rot).compile()
    rt = Runtime.new_fhe(params)
    prog = app.get_program(rot)
    n = params.poly_degree
    rows = np.arange(n, dtype=np.uint64) % 7
    r2 = rows.reshape(2, n // 2)
    want = (np.concatenate([np.roll(r2[0], -2), np.roll(r2[1], -2)])
            + rows)
    for seed in (5, 15):
        pub, priv = rt.generate_keys(seed=seed)
        ct = rt.encrypt(Batched(rows), pub, seed=seed + 1)
        (out,) = rt.run(prog, [ct], pub)
        got = np.asarray(rt.decrypt(out, priv)).reshape(-1)
        np.testing.assert_array_equal(got, want, err_msg=f"seed={seed}")


def test_search_skips_invalid_u32_small_n_candidates():
    """Round-5 regression: the u32 engine's small-N chains can have
    limbs BELOW a 20-bit batching plain modulus; BfvParams validation
    (ParamsError) must mean 'next degree', not a crashed search. This
    is the TPU default path (engine auto -> u32) that
    examples/simple_multiply.py exercises on hardware."""
    c = (Compiler().fhe_program(simple_multiply).engine("u32")
         .use_measured_noise_model(False))
    params = c._search_params()
    assert params.poly_degree >= 4096
    assert params.plain_modulus < min(params.coeff_modulus)
    assert max(q.bit_length() for q in params.coeff_modulus) <= 30
