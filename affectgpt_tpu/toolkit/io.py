"""CSV/NPZ IO helpers (toolkit/utils/read_files.py parity).

Small, widely-used readers the reference scatters across
toolkit/utils/read_files.py:1-262: column readers, name→value csv maps,
npz corpus access, and result-file writers shared by evaluation and
annotation tooling.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def func_read_key_from_csv(csv_path: str, key: str) -> List:
    import pandas as pd

    return list(pd.read_csv(csv_path)[key])


def func_write_key_to_csv(csv_path: str, names: Sequence, name2value: Dict, keys: Sequence[str]) -> None:
    import pandas as pd

    rows = []
    for name in names:
        value = name2value[name]
        if not isinstance(value, (list, tuple)):
            value = [value]
        rows.append({"name": name, **dict(zip(keys, value))})
    pd.DataFrame(rows).to_csv(csv_path, index=False)


def read_csv_as_map(csv_path: str, key: str = "name", value: str = "value") -> Dict:
    import pandas as pd

    df = pd.read_csv(csv_path)
    return dict(zip(df[key], df[value]))


def read_npz_corpus(npz_path: str, split: str) -> Dict[str, dict]:
    """label npz {split}_corpus dict access (the format every label file uses)."""
    return np.load(npz_path, allow_pickle=True)[split].tolist()


def write_name2value_npz(npz_path: str, name2value: Dict) -> None:
    np.savez_compressed(
        npz_path,
        filenames=list(name2value),
        fileitems=[name2value[n] for n in name2value],
    )


def read_name2value_npz(npz_path: str) -> Dict:
    data = np.load(npz_path, allow_pickle=True)
    return dict(zip(data["filenames"].tolist(), data["fileitems"].tolist()))
