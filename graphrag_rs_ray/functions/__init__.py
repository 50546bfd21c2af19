"""Pure deterministic kernels. No Ray imports here — everything in this
package is plain Python/numpy and unit-testable without a cluster."""
