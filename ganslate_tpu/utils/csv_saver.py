"""Per-sample metric rows -> CSV (reference parity:
/root/reference/ganslate/utils/csv_saver.py; `DataFrame.append` is long gone
from pandas, rows are buffered and concatenated at write time)."""

import pandas as pd


class Saver:

    def __init__(self) -> None:
        self.rows = []

    def add(self, row: dict) -> None:
        self.rows.append(dict(row))

    def write(self, path) -> None:
        pd.DataFrame(self.rows).to_csv(path)
