"""column_profile — the per-column audit must count NULLs and distincts
exactly; the sf tables carry no NULLs so this fixture plants them."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_column_profile_nulls_and_distincts(tmp_path):
    from osm_search_ray.pipelines.profile import PROFILE_COLS, column_profile

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": ["a", "b", "a", None, "", "b"],
            "lang": ["en", None, "en", "de", None, "en"],
            "source": ["s1"] * 6,
            "n_chars": np.array([1, 1, 1, 0, 0, 1], np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(tmp_path / "documents.parquet"))

    got = column_profile(str(tmp_path)).set_index("col")
    for c in PROFILE_COLS:
        s = df[c]
        v = s[s.notna()].astype(str)
        r = got.loc[c]
        assert r["n_rows"] == 6
        assert r["n_null"] == int(s.isna().sum())
        assert r["n_distinct"] == v.nunique()
        assert r["min_v"] == (v.min() if len(v) else "")
        assert r["max_v"] == (v.max() if len(v) else "")
        assert r["len_sum"] == int(v.str.len().sum())
