"""Mean and variance over encrypted data (reference:
`examples/mean_variance` — computes both over Rational inputs)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sunscreen_tpu.compiler import Compiler, fhe_program  # noqa: E402
from sunscreen_tpu.runtime import Runtime  # noqa: E402
from sunscreen_tpu.types import Cipher, Rational  # noqa: E402

DATA_LEN = 5


@fhe_program(scheme="bfv")
def mean_fn(a: Cipher[Rational], b: Cipher[Rational],
            c: Cipher[Rational], d: Cipher[Rational],
            e: Cipher[Rational]):
    return (a + b + c + d + e) / DATA_LEN


@fhe_program(scheme="bfv")
def variance_fn(a: Cipher[Rational], b: Cipher[Rational],
                c: Cipher[Rational], d: Cipher[Rational],
                e: Cipher[Rational]):
    mean = (a + b + c + d + e) / DATA_LEN
    var = ((a - mean) * (a - mean) + (b - mean) * (b - mean)
           + (c - mean) * (c - mean) + (d - mean) * (d - mean)
           + (e - mean) * (e - mean)) / DATA_LEN
    return var


def main():
    data = [1.0, 2.0, 3.0, 4.0, 10.0]
    app = (Compiler().fhe_program(mean_fn).compile())
    rt = Runtime.new_fhe(app.params)
    pub, priv = rt.generate_keys(galois=False)
    cts = [rt.encrypt(Rational(v), pub) for v in data]
    (m,) = rt.run(app.get_program(mean_fn), cts, pub)
    mean = float(rt.decrypt(m, priv))
    expect_mean = sum(data) / len(data)
    print(f"mean = {mean} (expect {expect_mean})")
    assert abs(mean - expect_mean) < 1e-9


if __name__ == "__main__":
    main()
