from nonconsumptive_spark.functions.text import (
    TOKEN_REGEX,
    ngram_structs,
    tokenize,
    tokens_with_pos,
)

__all__ = ["TOKEN_REGEX", "tokenize", "tokens_with_pos", "ngram_structs"]
