"""Dump one query's .explain("formatted") to a file:
python scripts/dump_one_plan.py <query> <out_file> [sf_dir]"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    name, out = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    from python_plugins_spark import get_spark
    from python_plugins_spark.queries import QUERIES
    spark = get_spark("dump_one_plan")
    df = QUERIES[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    with open(out, "w") as f:
        f.write(plan)
    print(f"wrote {out}")
    spark.stop()

if __name__ == "__main__":
    main()
