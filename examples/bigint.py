"""Unsigned big-integer arithmetic under encryption (reference:
`examples/bigint` — Unsigned types)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sunscreen_tpu.compiler import Compiler, fhe_program  # noqa: E402
from sunscreen_tpu.runtime import Runtime  # noqa: E402
from sunscreen_tpu.types import Cipher, Unsigned64  # noqa: E402


@fhe_program(scheme="bfv")
def mul_add(a: Cipher[Unsigned64], b: Cipher[Unsigned64],
            c: Cipher[Unsigned64]):
    return a * b + c


def main():
    app = Compiler().fhe_program(mul_add).compile()
    rt = Runtime.new_fhe(app.params)
    pub, priv = rt.generate_keys(galois=False)
    a, b, c = 123456789, 987654, 42
    cts = [rt.encrypt(Unsigned64(v), pub) for v in (a, b, c)]
    (out,) = rt.run(app.get_program(mul_add), cts, pub)
    got = rt.decrypt(out, priv)
    print(f"{a} * {b} + {c} = {got}")
    assert got == a * b + c


if __name__ == "__main__":
    main()
