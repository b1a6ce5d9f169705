"""Pollution-buffer retraction (reference parser/pt.go:627-669 analog)."""

import numpy as np
import pandas as pd
import pytest

from etl_ray.ops.pollution import flag_pollution, retraction_events


def frame(rows):
    return pd.DataFrame(rows, columns=["event_id", "dest", "last_hop",
                                       "complete"])


def flags(rows, window=2):
    return flag_pollution(frame(rows), order_col="event_id",
                          dest_col="dest", last_hop_col="last_hop",
                          complete_col="complete", window=window)


def test_incomplete_retracted_by_matching_later_dest():
    out = flags([
        (1, 5, 9, False),   # incomplete, last hop 9
        (2, 9, 3, True),    # dest 9 == R.last_hop, dest differs -> retracts 1
        (3, 4, 4, True),
    ])
    assert out["polluted"].tolist() == [True, False, False]
    assert out.loc[0, "retracted_by"] == 2


def test_complete_never_retracted_same_dest_never_pollutes():
    out = flags([
        (1, 5, 9, True),    # complete: fast path, never buffered
        (2, 9, 3, True),
        (3, 7, 8, False),   # incomplete but next dest == own dest
        (4, 7, 8, True),    # dest == R.dest -> not pollution (same target)
    ])
    assert out["polluted"].tolist() == [False] * 4
    assert out["retracted_by"].isna().all()


def test_window_bounds_buffer_depth():
    rows = [
        (1, 5, 9, False),
        (2, 1, 0, True),
        (3, 2, 0, True),
        (4, 9, 0, True),   # matches row 1's last hop but 3 steps later
    ]
    assert flags(rows, window=2)["polluted"].tolist() == [
        False, False, False, False]
    assert flags(rows, window=3)["polluted"].tolist() == [
        True, False, False, False]


def test_nearest_polluter_wins():
    out = flags([
        (1, 5, 9, False),
        (2, 9, 0, True),
        (3, 9, 0, True),
    ])
    assert out.loc[0, "retracted_by"] == 2  # k=1 beats k=2


def test_retraction_events_are_lww_winning_deletes():
    out = flags([
        (1, 5, 9, False),
        (2, 9, 3, True),
    ])
    out["doc"] = out["event_id"]
    d = retraction_events(out, id_col="doc", order_col="event_id",
                          seq_base=100)
    assert d["op"].tolist() == ["delete"]
    assert d["doc_id"].tolist() == ["1"]
    assert (d["sequence_number"] >= 100).all()
