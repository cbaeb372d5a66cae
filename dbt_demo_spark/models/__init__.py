from .fiction_bank import FICTION_BANK_TESTS, REGISTRY, build_fiction_bank
from .seeds import SEED_SCHEMAS, load_seed_dataframes, seed_rows

__all__ = ["FICTION_BANK_TESTS", "REGISTRY", "build_fiction_bank",
           "SEED_SCHEMAS", "load_seed_dataframes", "seed_rows"]
