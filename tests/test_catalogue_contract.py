"""Driver-contract integrity: every oracle key must have a queries()
twin, names must be unique and stable, and the __ray_entry__ surface
must expose exactly the catalogue (registration drift caught here, not
at the driver's gate)."""


def test_oracle_keys_subset_of_queries():
    from cartography_ray.pipelines.queries import QUERIES, oracle_sql_for

    osql = oracle_sql_for("/root/testdata/sf0.001")
    missing = set(osql) - set(QUERIES)
    assert not missing, f"oracle entries without a queries() twin: {missing}"
    # every catalogue callable takes exactly the sf_dir positional
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_ray_entry_exposes_catalogue():
    import __ray_entry__ as E
    from cartography_ray.pipelines.queries import QUERIES

    qs = E.queries()
    assert set(qs) == set(QUERIES)
    osql = E.oracle_sql()
    assert set(osql) <= set(qs)
    # the split is intentional: approximate/rows-only entries carry no SQL
    rows_only = set(qs) - set(osql)
    assert rows_only == {
        "events_distinct_users_hll", "docs_minhash_pairs",
        "docs_simhash_pairs", "emb_knn_lsh", "emb_knn_ivf", "emb_pca",
        "emb_clusters", "docs_bpe_merges", "docs_token_freq_cms",
        "emb_mmr", "docs_incremental_minhash", "emb_knn_pq",
        "docs_bpe_encoded", "docs_near_decontam",
    }, f"rows-only set changed: {sorted(rows_only)} — update this test "
    "deliberately when adding an approximate operator"
