"""Forensics: why does training not recover after the iter-3000 opacity reset?

Loads chkpnt2000 (healthy) and chkpnt4000 (sick) from output/lego_7k and
compares parameter/optimizer-state distributions of alive rows.
"""
import pickle
import sys

import numpy as np


def load(path):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    return blob["state"], blob["iteration"]


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def summarize(state, it):
    alive = np.asarray(state.alive)
    p = state.params
    op = sigmoid(np.asarray(p.opacity)[alive, 0])
    sc = np.exp(np.asarray(p.scaling)[alive])
    counts = np.asarray(state.adam_counts)[alive]
    mv = np.asarray(state.adam_v.opacity)[alive, 0]
    mm = np.asarray(state.adam_m.opacity)[alive, 0]
    print(f"== iter {it}: alive {alive.sum()} ==")
    print(f"  opacity: q[1,25,50,75,99]% = {np.percentile(op, [1,25,50,75,99]).round(4)}")
    print(f"  frac op<0.005: {(op<0.005).mean():.3f}  frac op>0.5: {(op>0.5).mean():.3f}")
    print(f"  max_scale:  q[50,90,99]% = {np.percentile(sc.max(1), [50,90,99]).round(4)}")
    print(f"  adam_counts: min {counts.min()} med {np.median(counts):.0f} max {counts.max()}")
    print(f"  adam_m.op: mean {mm.mean():.3e}  |m| med {np.median(np.abs(mm)):.3e}")
    print(f"  adam_v.op: med {np.median(mv):.3e}  max {mv.max():.3e}")
    for name in ["xyz", "scaling", "rotation", "features_dc"]:
        arr = np.asarray(getattr(p, name))[alive]
        nan = np.isnan(arr).any()
        print(f"  {name}: nan={nan}  absmax={np.abs(arr).max():.3f}")


for it in (2000, 4000, 6000):
    st, i = load(f"output/lego_7k/chkpnt{it}.pkl")
    summarize(st, i)
