/* Minimal util-logger replacement (parity-oracle build; the repo's
 * lib/util-logger submodule is empty).  API reconstructed from the
 * reference call sites (circminer.cpp:47-52, process_circ.cpp:26,325):
 * Logger::instance().{info,error,debug}(fmt, ...) with chainable
 * toggle_time()/set_prefix() and set_buffer_size(). */
#ifndef __UTIL_LOGGER_STUB__
#define __UTIL_LOGGER_STUB__

#include <cstdarg>
#include <cstdio>
#include <ctime>
#include <string>

class LogChannel {
public:
    explicit LogChannel(bool enabled = true) : enabled_(enabled) {}

    LogChannel &toggle_time() {
        with_time_ = !with_time_;
        return *this;
    }

    LogChannel &set_prefix(const char *p) {
        prefix_ = p;
        return *this;
    }

    LogChannel &set_buffer_size(int) { return *this; }

    void operator()(const char *fmt, ...) {
        if (!enabled_)
            return;
        if (with_time_) {
            char ts[32];
            time_t t = time(nullptr);
            struct tm tmv;
            localtime_r(&t, &tmv);
            strftime(ts, sizeof(ts), "%H:%M:%S ", &tmv);
            fputs(ts, stderr);
        }
        fputs(prefix_.c_str(), stderr);
        va_list ap;
        va_start(ap, fmt);
        vfprintf(stderr, fmt, ap);
        va_end(ap);
    }

private:
    bool enabled_;
    bool with_time_ = false;
    std::string prefix_;
};

class Logger {
public:
    LogChannel info;
    LogChannel error;
    LogChannel debug;

    static Logger &instance() {
        static Logger inst;
        return inst;
    }

private:
    Logger() : info(true), error(true), debug(false) {}
};

#endif
