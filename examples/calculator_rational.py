"""Four-function calculator on encrypted Rationals (reference:
`examples/calculator_rational` — add/sub/mul/div on Cipher[Rational])."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sunscreen_tpu.compiler import Compiler, fhe_program  # noqa: E402
from sunscreen_tpu.runtime import Runtime  # noqa: E402
from sunscreen_tpu.types import Cipher, Rational  # noqa: E402


@fhe_program(scheme="bfv")
def add(a: Cipher[Rational], b: Cipher[Rational]):
    return a + b


@fhe_program(scheme="bfv")
def sub(a: Cipher[Rational], b: Cipher[Rational]):
    return a - b


@fhe_program(scheme="bfv")
def mul(a: Cipher[Rational], b: Cipher[Rational]):
    return a * b


@fhe_program(scheme="bfv")
def div(a: Cipher[Rational], b: Cipher[Rational]):
    return a / b


def main():
    c = Compiler()
    for p in (add, sub, mul, div):
        c = c.fhe_program(p)
    app = c.compile()
    rt = Runtime.new_fhe(app.params)
    pub, priv = rt.generate_keys(galois=False)
    x, y = 3.5, -1.25
    cx = rt.encrypt(Rational(x), pub)
    cy = rt.encrypt(Rational(y), pub)
    for name, prog, expect in (
            ("+", add, x + y), ("-", sub, x - y),
            ("*", mul, x * y), ("/", div, x / y)):
        (out,) = rt.run(app.get_program(prog), [cx, cy], pub)
        got = float(rt.decrypt(out, priv))
        print(f"{x} {name} {y} = {got}")
        assert abs(got - expect) < 1e-9, (name, got, expect)


if __name__ == "__main__":
    main()
