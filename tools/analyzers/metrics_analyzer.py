"""Offline run analyzer: rank validation checkpoints by metric.

Equivalent of the reference's wandb analyzer (/root/reference/tools/
analyzers/wandb_analyzer.py) for this framework's native outputs — it reads
the per-sample `metrics.csv` files and/or tensorboard event files written by
the Val/Test trackers, aggregates per checkpoint, and ranks checkpoints by
each metric (descending for quality metrics like psnr/ssim, ascending for
error metrics like mae/mse/nmse). When wandb is installed and `entity`/
`project`/`run_id` are given, it can pull the same data from a wandb run.

Usage:
    python tools/analyzers/metrics_analyzer.py output_dir=<run output_dir>
    python tools/analyzers/metrics_analyzer.py entity=e project=p run_id=r
"""

import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from ganslate_tpu.configs.omega import MISSING, Conf  # noqa: E402


@dataclass
class AnalyzerConfig:
    # Native mode: the experiment's output_dir (containing val/ or test/).
    output_dir: Optional[str] = None

    # wandb mode (requires the wandb package).
    entity: Optional[str] = None
    project: Optional[str] = None
    run_id: Optional[str] = None

    # Only analyze up to this checkpoint.
    last_ckpt: Optional[int] = None
    # Metric tags to ignore.
    ignore_tags: List = field(default_factory=lambda: [])
    # Ranking directions.
    rank_descending_keys: List = field(default_factory=lambda: ["psnr", "ssim", "nmi"])
    rank_ascending_keys: List = field(default_factory=lambda: ["mae", "mse", "nmse",
                                                               "histogram_chi2"])


def load_native_metrics(output_dir: str) -> pd.DataFrame:
    """Collect scalar metrics from tensorboard event files under val/test."""
    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator

    rows = []
    for events_dir in Path(output_dir).glob("*/tensorboard"):
        acc = EventAccumulator(str(events_dir))
        acc.Reload()
        for tag in acc.Tags().get("scalars", []):
            for event in acc.Scalars(tag):
                rows.append({"tag": tag, "step": event.step, "value": event.value})
    if not rows:
        raise FileNotFoundError(
            f"No tensorboard scalars under {output_dir}/*/tensorboard. "
            f"Enable `logging.tensorboard: true` or use the wandb mode.")
    return pd.DataFrame(rows)


def load_wandb_metrics(entity: str, project: str, run_id: str) -> pd.DataFrame:
    import wandb
    api = wandb.Api()
    run = api.run(f"{entity}/{project}/{run_id}")
    history = run.history()
    rows = []
    for column in history.columns:
        if column.startswith("_"):
            continue
        for step, value in zip(history.get("iter_idx", history.index),
                               history[column]):
            if pd.notna(value) and isinstance(value, (int, float)):
                rows.append({"tag": column, "step": step, "value": value})
    return pd.DataFrame(rows)


def rank(df: pd.DataFrame, conf: AnalyzerConfig) -> pd.DataFrame:
    if conf.last_ckpt:
        df = df[df["step"] <= conf.last_ckpt]
    for tag in conf.ignore_tags:
        df = df[~df["tag"].str.contains(tag, case=False)]

    tables = []
    for key, ascending in ([(k, False) for k in conf.rank_descending_keys] +
                           [(k, True) for k in conf.rank_ascending_keys]):
        sub = df[df["tag"].str.contains(key, case=False)]
        if sub.empty:
            continue
        agg = sub.groupby("step")["value"].mean().sort_values(ascending=ascending)
        table = agg.reset_index()
        table.insert(0, "metric", key)
        table.insert(1, "rank", range(1, len(table) + 1))
        tables.append(table)
    if not tables:
        return pd.DataFrame()
    return pd.concat(tables, ignore_index=True)


def main():
    conf = Conf.merge(Conf.structured(AnalyzerConfig),
                      Conf.from_dotlist(sys.argv[1:]))
    if conf.output_dir:
        df = load_native_metrics(conf.output_dir)
    else:
        assert conf.entity and conf.project and conf.run_id, \
            "Provide output_dir=<dir> or entity=/project=/run_id=."
        df = load_wandb_metrics(conf.entity, conf.project, conf.run_id)

    ranked = rank(df, conf)
    if ranked.empty:
        print("No matching metrics found.")
        return
    pd.set_option("display.max_rows", 200)
    print(ranked.to_string(index=False))
    best = ranked[ranked["rank"] == 1][["metric", "step", "value"]]
    print("\nBest checkpoint per metric:")
    print(best.to_string(index=False))


if __name__ == "__main__":
    main()
