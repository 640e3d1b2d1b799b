# measurement harnesses (see README.md in this directory)
