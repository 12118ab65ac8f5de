from .similarity import cosine_similarity_col, cosine_topk  # noqa: F401
from .text import token_count_col, tokens_col, stopword_ratio_col  # noqa: F401
