# Regular package marker. Required: tests/refstubs.py appends /root/reference
# (whose tools/ IS a regular package) to sys.path; without this file our
# tools/ would be a namespace portion and Python's finder would prefer the
# reference's regular package, shadowing every tools.* import in the suite.
