"""``python -m couchwarehouse_spark`` — see :mod:`couchwarehouse_spark.cli`."""

import sys

from couchwarehouse_spark.cli import main

sys.exit(main())
