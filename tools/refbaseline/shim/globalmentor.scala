/* Stand-in for com.globalmentor:hadoop-bare-naked-local-fs, which only
 * matters on Windows (it bypasses winutils.exe). On Linux the plain Hadoop
 * LocalFileSystem has identical behavior, so the shim is a trivial
 * subclass. Compiled only into the /tmp reference-baseline build. */
package com.globalmentor.apache.hadoop.fs

class BareLocalFileSystem extends org.apache.hadoop.fs.LocalFileSystem
