"""Reporting: plots and CSV exports from on-device accumulators.

Host-side rendering of the metrics the reference derives from per-tick event
lists (transportation_simulator.py:387-746).  The data sources differ — the
TPU build accumulates hourly traffic counts on device (state.MetricState)
instead of replaying Python lists of (time, mask) tuples — but every output
artifact (leg_histogram.png, road_optimality.png, computation_time.png,
node_metrics.csv, daily_counts.png/csv) matches the reference's format.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def _savefig(fig, output_dir: Optional[str], filename: str):
    if output_dir is not None:
        os.makedirs(output_dir, exist_ok=True)
        fig.savefig(os.path.join(output_dir, filename))
        print(f"Saved {os.path.join(output_dir, filename)}")
    return fig


def plot_leg_histogram(values: list, timestep: int,
                       output_dir: Optional[str] = "data/outputs"):
    """Departures / arrivals / en-route over time, binned every 18 ticks
    (the reference's averaging window, ts.py:387-451)."""
    if not values:
        print("No data available for plotting.")
        return None
    arr = np.asarray(values, dtype=np.float64)  # [T, 4] = dep, arr, on_way, t
    n = max(1, 18 // max(timestep, 1))
    T = arr.shape[0]
    nbins = (T + n - 1) // n
    pad = nbins * n - T
    padded = np.pad(arr, ((0, pad), (0, 0)))
    dep = padded[:, 0].reshape(nbins, n).sum(axis=1)
    arrv = padded[:, 1].reshape(nbins, n).sum(axis=1)
    on_way = arr[::n, 2][:nbins]
    t_min = arr[::n, 3][:nbins] / 60.0

    fig, ax1 = plt.subplots(figsize=(12, 6))
    ax1.step(t_min, on_way, label="On Way", color="green")
    ax1.step(t_min, dep, label="Departure", color="red", linestyle="--", where="post")
    ax1.step(t_min, arrv, label="Arrival", color="blue", linestyle="-.", where="post")
    ax1.set_ylabel("Number of Agents")
    ax1.set_xlabel("Minute of Day")
    ax1.legend(loc="upper left")
    ax1.set_title("Leg Histogram Over Time")
    fig.tight_layout()
    return _savefig(fig, output_dir, "leg_histogram.png")


def plot_road_optimality(values: list, output_dir: Optional[str] = "data/outputs",
                         road_ids: Optional[list] = None):
    """Congestion delay (sum of clamp(travel - fftt, 0) over outgoing turn
    edges) per road over time (ts.py:453-514); the per-source aggregation is
    already done on device (core.direction.direction_step)."""
    if not values:
        print("No road optimality data available for plotting.")
        return None
    times = np.asarray([t for t, _ in values]) / 3600.0
    mat = np.stack([np.asarray(v) for _, v in values], axis=0)  # [T, R]
    fig, ax = plt.subplots(figsize=(12, 6))
    ids = road_ids if road_ids else range(mat.shape[1])
    for rid in ids:
        ax.plot(times, mat[:, rid], label=f"Road {rid}")
    ax.set_xlabel("Time (h)")
    ax.set_ylabel("Delta Travel Time (s) — sum over outgoing edges")
    ax.set_title("Road Optimality (Aggregated by Source Road) Over Time")
    if len(list(ids)) <= 20:
        ax.legend()
    fig.tight_layout()
    return _savefig(fig, output_dir, "road_optimality.png")


def plot_road_optimality_columns(times_s: np.ndarray, cols: dict,
                                 output_dir: Optional[str] = "data/outputs"):
    """Column-oriented twin of :func:`plot_road_optimality` for the sparse
    per-tick store (big networks): ``cols`` maps road id -> [T] series, so
    the dense [T, R] matrix is never materialized (ts.py:453-514)."""
    if not cols or not np.asarray(times_s).size:
        print("No road optimality data available for plotting.")
        return None
    times = np.asarray(times_s) / 3600.0
    fig, ax = plt.subplots(figsize=(12, 6))
    for rid, series in cols.items():
        ax.plot(times, np.asarray(series), label=f"Road {rid}")
    ax.set_xlabel("Time (h)")
    ax.set_ylabel("Delta Travel Time (s) — sum over outgoing edges")
    ax.set_title("Road Optimality (Aggregated by Source Road) Over Time")
    if len(cols) <= 20:
        ax.legend()
    fig.tight_layout()
    return _savefig(fig, output_dir, "road_optimality.png")


def plot_computation_time(timers, output_dir: str = "data/outputs"):
    """Phase-time pie chart (ts.py:516-561)."""
    times = [
        timers.inserting_time,
        timers.choice_time,
        timers.core_time,
        timers.withdraw_time,
    ]
    labels = ["Inserting", "Choice", "Core", "Withdraw"]
    total = sum(times)
    if total == 0:
        print("No computation time data available for plotting.")
        return None

    def fmt(pct):
        return f"{pct:.1f}%\n{pct / 100 * total:.2f} s"

    fig = plt.figure(figsize=(8, 8))
    plt.pie(times, labels=labels, autopct=fmt, startangle=90)
    plt.title(f"Computation Time Distribution\nTotal: {total:.2f} s")
    plt.axis("equal")
    return _savefig(fig, output_dir, "computation_time.png")


def _trim_hours(hourly_counts: np.ndarray) -> np.ndarray:
    """Drop trailing all-zero hour rows (the reference sizes its matrix by
    the last event hour, ts.py:598-599)."""
    nz = np.nonzero(hourly_counts.sum(axis=1))[0]
    last = int(nz[-1]) + 1 if nz.size else 1
    return hourly_counts[:last]


def compute_node_metrics(hourly_counts: np.ndarray, max_flow: np.ndarray,
                         output_dir: Optional[str] = "data/outputs") -> dict:
    """Per-road V/C statistics + hourly counts CSV (ts.py:563-669).

    ``hourly_counts`` is the on-device [H, R] accumulator; V/C is the hourly
    traversal count over the road's flow capacity (veh/h).
    """
    counts = _trim_hours(np.asarray(hourly_counts))  # [H, R]
    counts_per_node = counts.T  # [R, H]
    num_nodes, num_hours = counts_per_node.shape

    cap = np.asarray(max_flow, dtype=np.float64).copy()
    cap[cap == 0] = np.nan
    vc = counts_per_node / cap[:, None]
    avg_vc = np.nanmean(vc, axis=1)
    std_vc = np.nanstd(vc, axis=1)

    if output_dir is not None:
        import pandas as pd

        df = pd.DataFrame(
            counts_per_node, columns=[f"count_{h}h" for h in range(num_hours)]
        )
        df.insert(0, "node_id", range(num_nodes))
        df.insert(1, "avg_vc", avg_vc)
        df.insert(2, "std_vc", std_vc)
        os.makedirs(output_dir, exist_ok=True)
        path = os.path.join(output_dir, "node_metrics.csv")
        df.to_csv(path, index=False)
        print(f"Wrote {path}")

    return {
        n: {
            "avg_vc": float(avg_vc[n]),
            "std_vc": float(std_vc[n]),
            "hourly_counts": counts_per_node[n].tolist(),
        }
        for n in range(num_nodes)
    }


def plot_daily_counts(hourly_counts: np.ndarray, expected_counts: dict,
                      output_dir: Optional[str] = "data/outputs"):
    """Simulated vs MSA-expected daily link counts, scatter + CSV
    (ts.py:672-746)."""
    counts = np.asarray(hourly_counts)
    sim_totals = counts.sum(axis=0)  # [R]
    num_nodes = sim_totals.shape[0]
    road_ids = sorted(k for k in expected_counts if 0 <= k < num_nodes)
    x = np.asarray([expected_counts[i] for i in road_ids], dtype=np.float64)
    y = sim_totals[road_ids].astype(np.float64)

    fig, ax = plt.subplots()
    ax.scatter(x, y, alpha=0.7)
    max_val = float(max(x.max() if x.size else 0.0, y.max() if y.size else 0.0))
    ax.plot([0, max_val], [0, max_val], "r--", linewidth=1)
    ax.set_xlabel("Expected daily count")
    ax.set_ylabel("Simulated daily count")
    ax.set_title("Daily Link Counts: Expected vs Simulated")
    fig.tight_layout()

    if output_dir is not None:
        import pandas as pd

        os.makedirs(output_dir, exist_ok=True)
        df = pd.DataFrame(
            {
                "link_id": road_ids,
                "simulated": y,
                "expected": x,
                "difference": y - x,
            }
        )
        csv_path = os.path.join(output_dir, "daily_counts.csv")
        df.to_csv(csv_path, index=False)
        print(f"Daily counts CSV saved as {csv_path}")
    return _savefig(fig, output_dir, "daily_counts.png")
