"""Sources: raw-format readers and the ingest pipeline.

The reference's entire implemented surface is one source — hospital
EEG session CSVs → partitioned parquet (reference
spark-apps/sparkle-v5..v9.py). `eeg_csv` re-expresses it; `fixture`
generates deterministic test corpora in the same format.
"""
