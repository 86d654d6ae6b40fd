from . import efficiency, generate, perplexity  # noqa: F401
