from .textio import (
    letters_of_key,
    letters_of_haystack,
    parse_start_end,
    key_from_letters,
)

__all__ = [
    "letters_of_key",
    "letters_of_haystack",
    "parse_start_end",
    "key_from_letters",
]
