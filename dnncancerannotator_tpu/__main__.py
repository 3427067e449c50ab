'''CLI entry: ``python3 -m dnncancerannotator_tpu {train,evaluate,predict,
extract_all,generate_tfrecords}`` (parity with reference annotator/__main__.py).'''

from .runs.__main__ import main

if __name__ == '__main__':
    main(prog='python3 -m dnncancerannotator_tpu')
