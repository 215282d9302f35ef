"""The minimum end-to-end slice: encrypt two Signed values, multiply
homomorphically, decrypt (reference: `examples/simple_multiply`)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sunscreen_tpu.compiler import Compiler, fhe_program  # noqa: E402
from sunscreen_tpu.runtime import Runtime  # noqa: E402
from sunscreen_tpu.types import Cipher, Signed  # noqa: E402


@fhe_program(scheme="bfv")
def simple_multiply(a: Cipher[Signed], b: Cipher[Signed]):
    return a * b


def main():
    app = Compiler().fhe_program(simple_multiply).compile()
    rt = Runtime.new_fhe(app.params)
    public_key, private_key = rt.generate_keys(galois=False)

    a = rt.encrypt(Signed(15), public_key)
    b = rt.encrypt(Signed(5), public_key)
    (result,) = rt.run(app.get_program(simple_multiply), [a, b],
                       public_key)
    value = rt.decrypt(result, private_key)
    print(f"15 * 5 = {value} "
          f"(params: N={app.params.poly_degree}, "
          f"{len(app.params.coeff_modulus)} limbs)")
    assert value == 75


if __name__ == "__main__":
    main()
