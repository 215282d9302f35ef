"""Calculator on encrypted fixed-point Fractional values (reference:
`examples/calculator_fractional`)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sunscreen_tpu.compiler import Compiler, fhe_program  # noqa: E402
from sunscreen_tpu.runtime import Runtime  # noqa: E402
from sunscreen_tpu.types import Cipher, Fractional  # noqa: E402

Frac = Fractional[24]


@fhe_program(scheme="bfv")
def add(a: Cipher[Frac], b: Cipher[Frac]):
    return a + b


@fhe_program(scheme="bfv")
def sub(a: Cipher[Frac], b: Cipher[Frac]):
    return a - b


@fhe_program(scheme="bfv")
def mul(a: Cipher[Frac], b: Cipher[Frac]):
    return a * b


def main():
    c = Compiler()
    for p in (add, sub, mul):
        c = c.fhe_program(p)
    app = c.compile()
    rt = Runtime.new_fhe(app.params)
    pub, priv = rt.generate_keys(galois=False)
    x, y = 6.125, -2.25
    cx = rt.encrypt(Frac(x), pub)
    cy = rt.encrypt(Frac(y), pub)
    for name, prog, expect in (("+", add, x + y), ("-", sub, x - y),
                               ("*", mul, x * y)):
        (out,) = rt.run(app.get_program(prog), [cx, cy], pub)
        got = rt.decrypt(out, priv)
        print(f"{x} {name} {y} = {got}")
        assert abs(got - expect) < 1e-9


if __name__ == "__main__":
    main()
