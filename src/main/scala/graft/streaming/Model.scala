package graft.streaming

/** Wire shapes of the reference's message-tracking stream
  * (reference: undelivered-message-alert/phone_message_producer.py:302-323,
  * message-tracking.json:36-55). `timestamp` is epoch MILLISECONDS — the
  * on-wire convention of the reference producer
  * (phone_message_producer.py:406-408).
  */
case class MessageStatus(
    messageId: String,
    status: String, // "sent" | "delivered"
    phoneNumber: Long,
    carrier: String,
    timestamp: Long)

/** Alert emitted when a message stays undelivered past the timeout
  * (reference: README.md:31-35 — the declared-but-unimplemented north
  * star query). */
case class UndeliveredAlert(
    messageId: String,
    phoneNumber: Long,
    carrier: String,
    sentTime: Long,
    deadline: Long)

/** Keyed detector state: one small record per in-flight message —
  * heartbeats do NOT grow it (reference parity: heartbeats re-send
  * `sent` every 30s, phone_message_producer.py:540-568, and must not
  * extend the deadline, which is governed by the first sent_time).
  * Both firsts are tracked so a `delivered` arriving in an earlier
  * micro-batch than its `sent` (out-of-order across batches) still
  * resolves exactly like the batch replay. */
case class MsgState(
    phoneNumber: Long,
    carrier: String,
    firstSent: Option[Long],
    firstDelivered: Option[Long])

/** A generator fork's birth row: frozen per-key vars plus the
  * classified delivery delay (None = never delivered) — the D2 frozen
  * state the reference keeps per fork (message-tracking.json:14-35). */
case class GenBirth(
    messageId: String,
    phoneNumber: Long,
    carrier: String,
    ts: Long,
    deliveryDelayMs: Option[Long])

/** Generator state-machine state for one in-flight message
  * (message-tracking.json:56-71): the frozen vars plus the clock the
  * heartbeat/delivery timers run against. */
case class GenLife(
    phoneNumber: Long,
    carrier: String,
    sentTime: Long,
    deliveryDelayMs: Option[Long])
