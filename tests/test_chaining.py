"""Program chaining (reference: `sunscreen/tests/chaining.rs`): the
chain_count knob multiplies the noise budget a program must survive,
pushing parameter selection upward."""

import pytest

from sunscreen_tpu.compiler import Compiler, PlainModulusConstraint
from sunscreen_tpu.compiler.trace import fhe_program
from sunscreen_tpu.errors import SunscreenError
from sunscreen_tpu.types import Cipher, Signed


def test_chain_count_defaults_to_1():
    @fhe_program(scheme="bfv")
    def my_program():
        pass

    assert my_program.chain_count == 1


def test_chain_count_is_overridable():
    @fhe_program(scheme="bfv", chain_count=42)
    def my_program():
        pass

    assert my_program.chain_count == 42


def test_cant_chain_multiple_programs():
    @fhe_program(scheme="bfv", chain_count=42)
    def program_1():
        pass

    @fhe_program(scheme="bfv")
    def program_2():
        pass

    with pytest.raises((SunscreenError, ValueError)):
        (Compiler()
         .fhe_program(program_1)
         .fhe_program(program_2)
         .compile())


def test_chaining_increases_parameters():
    @fhe_program(scheme="bfv")
    def mul_1(a: Cipher[Signed], b: Cipher[Signed]):
        return a * b

    app = (Compiler()
           .fhe_program(mul_1)
           .plain_modulus_constraint(PlainModulusConstraint.Raw(256))
           .compile())
    n1 = app.params.poly_degree

    @fhe_program(scheme="bfv", chain_count=3)
    def mul_2(a: Cipher[Signed], b: Cipher[Signed]):
        return a * b

    app2 = (Compiler()
            .fhe_program(mul_2)
            .plain_modulus_constraint(PlainModulusConstraint.Raw(256))
            .compile())
    n2 = app2.params.poly_degree
    # reference asserts 4096 -> 8192 for this exact workload
    assert n1 == 4096, n1
    assert n2 == 8192, n2
