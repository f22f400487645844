import numpy as np

from vic_tpu.timeaxis import (count_records, days_in_month, is_leap,
                              make_time_axis)


def test_leap_years():
    assert is_leap(2000)
    assert is_leap(1996)
    assert not is_leap(1900)
    assert not is_leap(1995)
    assert days_in_month(1996, 2) == 29
    assert days_in_month(1995, 2) == 28


def test_daily_axis():
    ax = make_time_axis(1995, 1, 1, 0, 365, 24)
    assert ax.nrecs == 365
    assert ax.year[0] == 1995 and ax.month[0] == 1 and ax.day[0] == 1
    assert ax.year[-1] == 1995 and ax.month[-1] == 12 and ax.day[-1] == 31
    assert ax.day_in_year[-1] == 365


def test_leap_crossing():
    ax = make_time_axis(1996, 2, 28, 0, 3, 24)
    assert list(ax.day[:3]) == [28, 29, 1]
    assert list(ax.month[:3]) == [2, 2, 3]


def test_subdaily():
    ax = make_time_axis(1995, 1, 1, 0, 48, 3)
    assert ax.nrecs == 48
    assert list(np.unique(ax.hour)) == [0, 3, 6, 9, 12, 15, 18, 21]
    assert ax.day[8] == 2  # second day starts at rec 8


def test_count_records():
    assert count_records(1995, 1, 1, 0, 1995, 12, 31, 24) == 365
    assert count_records(1996, 1, 1, 0, 1996, 12, 31, 24) == 366
    assert count_records(1995, 1, 1, 0, 1995, 1, 1, 1) == 24
