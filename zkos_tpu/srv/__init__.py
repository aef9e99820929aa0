"""Service plane: relayer, fee estimator, prover server, client state.

Thin, dependency-free mirrors of the reference's L7 services
(crates/shielder-relayer, crates/fee-estimator, tee/*): REST over stdlib
HTTP, worker fleets over queues, the length-prefixed prover protocol over
sockets.  See SURVEY.md §2.0 [SERVICE] rows.
"""
