"""Experiment-log parsing and aggregation (the hiplot pipeline).

Equivalent of the reference's hiplogs module (url_benchmark/hiplogs.py):
the append-only JSON-lines `hip.log` files written by the Logger are
discovered across experiment folder trees, parsed, statistics-aggregated
(mean/min/max over steps), and exported as flat records suitable for
hiplot parallel-coordinate exploration (`load()` mirrors hiplogs.load
:118-148; to_hiplot_experiment :53-93 is replaced by `to_records`).
"""

from __future__ import annotations

import json
import statistics
import typing as tp
from pathlib import Path


class HipLog:
    """Reader/aggregator for one hip.log file (reference HipLog,
    url_benchmark/hiplogs.py:151-341; writing lives in
    train/logger.JsonlLogger)."""

    def __init__(self, filepath: tp.Union[str, Path]) -> None:
        self.filepath = Path(filepath)

    def read(self, step_key: str = "eval_step") -> tp.List[tp.Dict[str, tp.Any]]:
        out: tp.List[tp.Dict[str, tp.Any]] = []
        if not self.filepath.exists():
            return out
        with self.filepath.open() as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        out.append(json.loads(line))
                    except json.JSONDecodeError:
                        continue
        return out

    def last(self) -> tp.Dict[str, tp.Any]:
        rows = self.read()
        return rows[-1] if rows else {}

    def aggregate(self, keys: tp.Optional[tp.Sequence[str]] = None
                  ) -> tp.Dict[str, float]:
        """mean/min/max/last per numeric key over all rows (the
        float-stat aggregation of reference hiplogs :249-290)."""
        rows = self.read()
        series: tp.Dict[str, tp.List[float]] = {}
        for row in rows:
            for k, v in row.items():
                if isinstance(v, (int, float)) and not k.startswith("#"):
                    if keys is None or k in keys:
                        series.setdefault(k, []).append(float(v))
        out: tp.Dict[str, float] = {}
        for k, vals in series.items():
            out[f"{k}_mean"] = statistics.fmean(vals)
            out[f"{k}_min"] = min(vals)
            out[f"{k}_max"] = max(vals)
            out[f"{k}_last"] = vals[-1]
        return out


def load(folder: tp.Union[str, Path],
         pattern: str = "**/hip.log") -> tp.List[tp.Dict[str, tp.Any]]:
    """Discover and flatten all experiment logs under a folder tree
    (reference hiplogs.load, url_benchmark/hiplogs.py:118-148). Each
    record = flattened config.json (if present) + aggregated metrics."""
    folder = Path(folder)
    records: tp.List[tp.Dict[str, tp.Any]] = []
    for log_path in sorted(folder.glob(pattern)):
        record: tp.Dict[str, tp.Any] = {"xp": str(log_path.parent)}
        cfg_path = log_path.parent / "config.json"
        if cfg_path.exists():
            try:
                record.update(json.loads(cfg_path.read_text()))
            except json.JSONDecodeError:
                pass
        record.update(HipLog(log_path).aggregate())
        records.append(record)
    return records


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    """CLI: flatten every experiment under a folder tree to JSON lines
    (the reference's `python -m hiplot url_benchmark.hiplogs.load` niche,
    README.md:80-86 — records are hiplot-ready flat dicts)."""
    import sys
    args = list(argv if argv is not None else sys.argv[1:])
    if not args or "--help" in args or "-h" in args:
        print(__doc__)
        print("usage: python -m controllable_agent_tpu.train.hiplogs FOLDER")
        return
    for record in load(args[0]):
        print(json.dumps(record))


if __name__ == "__main__":
    main()
