from .boat import run_pipeline, summarize, transform  # noqa: F401
