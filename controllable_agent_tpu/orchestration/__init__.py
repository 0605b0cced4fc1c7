from .runner import EntryPoint, CopiedBenchmark
from .executor import DelayedExecutor, LocalExecutor, wait_for_jobs
