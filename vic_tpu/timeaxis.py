"""Simulation time axis — the TPU-native equivalent of the reference date engine
(/root/reference/make_dmy.c: builds ``dmy_struct[nrecs]`` with year/month/day/hour/
day_in_year including leap years).

Here the time axis is a struct-of-arrays (numpy int32 vectors) built host-side once;
device kernels receive only derived per-record scalars (day_in_year, hour) through the
scanned forcing stream, so no datetime logic is ever traced.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

DAYS_IN_MONTH = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)


def is_leap(year: int) -> bool:
    # Gregorian leap rule (make_dmy.c LEAPYR macro)
    return (year % 4 == 0 and year % 100 != 0) or (year % 400 == 0)


def days_in_month(year: int, month: int) -> int:
    if month == 2 and is_leap(year):
        return 29
    return DAYS_IN_MONTH[month - 1]


def days_in_year(year: int) -> int:
    return 366 if is_leap(year) else 365


@dataclass(frozen=True)
class TimeAxis:
    """Struct-of-arrays date vector for all model records."""
    year: np.ndarray        # int32 [nrecs]
    month: np.ndarray       # int32 [nrecs], 1-based
    day: np.ndarray         # int32 [nrecs], 1-based
    hour: np.ndarray        # int32 [nrecs], 0-23
    day_in_year: np.ndarray  # int32 [nrecs], 1-based

    @property
    def nrecs(self) -> int:
        return len(self.year)

    def index_of(self, year: int, month: int, day: int, hour: int = 0) -> int:
        m = ((self.year == year) & (self.month == month)
             & (self.day == day) & (self.hour == hour))
        idx = np.nonzero(m)[0]
        if len(idx) == 0:
            raise ValueError(f"date {year}-{month}-{day}T{hour} not on time axis")
        return int(idx[0])


def make_time_axis(startyear: int, startmonth: int, startday: int, starthour: int,
                   nrecs: int, dt_hours: int) -> TimeAxis:
    """Build the record time axis (make_dmy.c semantics: fixed dt in hours, no
    calendar gaps, leap days included)."""
    years = np.empty(nrecs, np.int32)
    months = np.empty(nrecs, np.int32)
    days = np.empty(nrecs, np.int32)
    hours = np.empty(nrecs, np.int32)
    doys = np.empty(nrecs, np.int32)

    y, m, d, h = startyear, startmonth, startday, starthour
    doy = sum(days_in_month(y, mm) for mm in range(1, m)) + d
    for i in range(nrecs):
        years[i], months[i], days[i], hours[i], doys[i] = y, m, d, h, doy
        h += dt_hours
        while h >= 24:
            h -= 24
            d += 1
            doy += 1
            if d > days_in_month(y, m):
                d = 1
                m += 1
                if m > 12:
                    m = 1
                    y += 1
                    doy = 1
    return TimeAxis(years, months, days, hours, doys)


def count_records(startyear: int, startmonth: int, startday: int, starthour: int,
                  endyear: int, endmonth: int, endday: int, dt_hours: int) -> int:
    """Number of records from start date through the END of endday
    (get_global_param.c derives nrecs from ENDYEAR/ENDMONTH/ENDDAY inclusively)."""
    days = 0
    y, m, d = startyear, startmonth, startday
    while (y, m, d) <= (endyear, endmonth, endday):
        days += 1
        d += 1
        if d > days_in_month(y, m):
            d = 1
            m += 1
            if m > 12:
                m = 1
                y += 1
    hours = days * 24 - starthour
    return hours // dt_hours


def time_axis_from_params(gp) -> TimeAxis:
    """Build the axis straight from GlobalParams (deriving nrecs if needed)."""
    nrecs = gp.nrecs
    if nrecs is None or nrecs < 0:
        nrecs = count_records(gp.startyear, gp.startmonth, gp.startday, gp.starthour,
                              gp.endyear, gp.endmonth, gp.endday, gp.dt)
    return make_time_axis(gp.startyear, gp.startmonth, gp.startday, gp.starthour,
                          nrecs, gp.dt)
