from .seeding import init_seeds
from .rundir import make_run_dir, RunPaths
from .logging import BoxPrinter, MetricsLog
from .checkpoint import save_snapshot, load_snapshot

__all__ = [
    "init_seeds",
    "make_run_dir",
    "RunPaths",
    "BoxPrinter",
    "MetricsLog",
    "save_snapshot",
    "load_snapshot",
]
