from .cli import run_config, CONFIGS, main  # noqa: F401
