"""spark-submit entrypoint: the engine shipped via --py-files.

The driver script imports frontier_engine ONLY from the --py-files zip
(this file lives outside the package), proving the packaging works.
"""

from frontier_engine import benchrun

if __name__ == "__main__":
    benchrun.main()
