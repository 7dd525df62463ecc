from .decode import constrained_generate
from .matcher import GrammarError, GrammarSession, JsonMatcher, TokenMaskCache

__all__ = ["constrained_generate", "GrammarError", "GrammarSession", "JsonMatcher", "TokenMaskCache"]
