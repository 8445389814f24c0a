"""Deterministic EEG-session CSV fixture generator.

Produces corpora in the reference's raw file format (layout per
reference random_generator.py:26-53 and FIXTURES.md §1, implementation
our own):

    row 1-6   key/value metadata (File, PatientName, PatientID,
              PatientBirthDate, TestDate, TestTime)
    row 7     super-category labels aligned with the header columns
              (first column of each span labeled, rest blank)
    row 8     header: ClockDateTime, Time, S1_1 ... S{n}_1
    row 9+    data: unix_seconds/1e5 (the ×1e5 encoding,
              reference random_generator.py:48), seq index, floats

Everything is seeded — same args, same bytes — so ingest tests and
the driver's rows-only checks are reproducible.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timezone

SUPERCAT_SPAN = 5  # columns per super-category group


def generate_corpus(
    out_dir: str,
    n_patients: int = 2,
    max_sessions: int = 2,
    rows_per_session: int = 100,
    n_signals: int = 20,
    seed: int = 42,
    patient_offset: int = 0,
) -> list[str]:
    """Write a deterministic corpus of session CSVs; returns paths.
    ``patient_offset`` shifts patient numbering so a second corpus can
    land in the same staging dir without filename collisions."""
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    header = ["ClockDateTime", "Time"] + [f"S{i + 1}_1" for i in range(n_signals)]
    supercat = [""] * 2 + [
        f"Group {1 + i // SUPERCAT_SPAN}" if i % SUPERCAT_SPAN == 0 else ""
        for i in range(n_signals)
    ]
    paths = []
    for p in range(1 + patient_offset, n_patients + 1 + patient_offset):
        n_sessions = 1 + rng.randrange(max_sessions)
        for s in range(1, n_sessions + 1):
            year = rng.randrange(2015, 2024)
            month = rng.randrange(1, 13)
            day = rng.randrange(1, 28)
            hour = rng.randrange(0, 23)
            start = int(
                datetime(year, month, day, hour, tzinfo=timezone.utc).timestamp()
            )
            name = f"PUH-{year}-{p:03d}_{s:02d}.csv"
            path = os.path.join(out_dir, name)
            with open(path, "w") as f:
                f.write(f"File,{name}\n")
                f.write(f"PatientName,Patient {p:03d}\n")
                f.write(f"PatientID,P{p:05d}\n")
                f.write(f"PatientBirthDate,{1950 + p}/{1 + p % 12}/{1 + p % 27}\n")
                f.write(f"TestDate,{year}/{month}/{day}\n")
                f.write(f"TestTime,{hour}:00:00\n")
                f.write(",".join(supercat) + "\n")
                f.write(",".join(header) + "\n")
                for i in range(rows_per_session):
                    vals = [f"{rng.uniform(-100, 100):.8f}" for _ in range(n_signals)]
                    f.write(
                        ",".join([f"{(start + i) / 1e5:.5f}", str(i)] + vals) + "\n"
                    )
            paths.append(path)
    return sorted(paths)
