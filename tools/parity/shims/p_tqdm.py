'''Shim: sequential p_tqdm (multiprocess map only used by generate_tfrecords).'''
def p_map(fn, *iterables, **kw):
    return list(map(fn, *iterables))
def p_umap(fn, *iterables, **kw):
    return list(map(fn, *iterables))
def p_imap(fn, *iterables, **kw):
    return map(fn, *iterables)
