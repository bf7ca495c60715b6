from . import limb
from .host import Fp, batch_invert
from .spec import (
    BN254_FQ,
    BN254_FR,
    BLS12_381_FR,
    GRUMPKIN_FQ,
    GRUMPKIN_FR,
    NUM_DIGITS,
    PALLAS_BASE,
    PALLAS_SCALAR,
    VESTA_BASE,
    VESTA_SCALAR,
    FieldSpec,
)

__all__ = [
    "limb",
    "Fp",
    "batch_invert",
    "FieldSpec",
    "BN254_FR",
    "BLS12_381_FR",
    "BN254_FQ",
    "GRUMPKIN_FR",
    "GRUMPKIN_FQ",
    "PALLAS_BASE",
    "PALLAS_SCALAR",
    "VESTA_BASE",
    "VESTA_SCALAR",
    "NUM_DIGITS",
]
