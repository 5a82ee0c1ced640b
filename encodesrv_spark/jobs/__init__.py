# The encode-job pipeline: schemas, status state machine, scheduler,
# command assembly, external-process operator.
