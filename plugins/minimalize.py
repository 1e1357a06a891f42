"""Example plugin (analog of the reference's plugins/minimalize: strip a
variant table down to its core identity columns,
/root/reference/plugins/minimalize).

Registers the ``plugin_minimalize`` operator: core columns of lineitem plus
one config-driven calculated column, demonstrating the plugin +
calculations-config surfaces together.
"""

__enabled__ = True

CALCULATIONS = [
    {"name": "revenue",
     "op": "round",
     "ndigits": 2,
     "args": [{"op": "mul",
               "args": ["l_extendedprice",
                        {"op": "sub", "args": [{"const": 1.0}, "l_discount"]}]}]},
]


def register(reg):
    def minimalize(sf_dir: str):
        import ray.data

        from howard_ray.plugins import compile_calculations

        ds = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"])
        calc = compile_calculations(CALCULATIONS)

        def f(batch):
            out = calc(batch)
            return out.select(["l_orderkey", "l_linenumber", "revenue"])

        return ds.map_batches(f, batch_format="pyarrow")

    reg.add("plugin_minimalize", minimalize, sql="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 2) AS revenue
FROM lineitem
""")
