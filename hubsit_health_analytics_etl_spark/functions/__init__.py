from .case import band, case_map, status_machine
from .crypto import pseudonymize, sha256_hex
from .nulls import safe_div, safe_rate
from .temporal import age_years, duration, shift_of_day
from .text import currency_to_double, normalize_key

__all__ = [
    "band",
    "case_map",
    "status_machine",
    "pseudonymize",
    "sha256_hex",
    "safe_div",
    "safe_rate",
    "age_years",
    "duration",
    "shift_of_day",
    "currency_to_double",
    "normalize_key",
]
