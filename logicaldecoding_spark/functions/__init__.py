from .text import char_shingles, tokens  # noqa: F401
from .vectors import cosine, dot, norm  # noqa: F401
