from .openai import ChatCompletionServer, serve

__all__ = ["ChatCompletionServer", "serve"]
